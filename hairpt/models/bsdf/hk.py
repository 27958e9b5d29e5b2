"""Hanrahan-Krueger single-scattering slab BSDF.

Reference: src/bsdfs/hk.cpp (index-matched homogeneous layer of thickness
d with σs/σa and an HG phase function; single-scattered glossy
reflection/transmission + attenuated delta transmission).

Parameter mapping in the material row: transmit = σs, sigma_a = σa,
alpha = thickness d, beta_r = HG asymmetry g.

  τd = (σs + σa)·d,  albedo = σs/σt
  f_R  = albedo · p(γ) · μi/(μi+μo) · (1 − e^{−τd(1/μi+1/μo)}) · μo
  f_T  = albedo · p(γ) · μi/(μi−μo) · (e^{−τd/μi} − e^{−τd/μo}) · μo
  delta T weight = e^{−τd/μi}  (wo = −wi)
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ...models import media as med
from . import registry as R

LUM = np.array([0.212671, 0.715160, 0.072169], np.float32)


def _tau_albedo(gm):
    sig_s = gm.transmit
    sig_a = gm.sigma_a
    sig_t = sig_s + sig_a
    tau = sig_t * gm.alpha[..., None]
    albedo = jnp.where(sig_t > 0, sig_s / jnp.maximum(sig_t, 1e-12), 0.0)
    return tau, albedo


def _single_scatter(gm, wi, wo):
    """Glossy part of f·|cosθo| (reference hk.cpp eval, ESolidAngle)."""
    tau, albedo = _tau_albedo(gm)
    mu_i = wi[..., 2]
    mu_o = wo[..., 2]
    ami = jnp.maximum(jnp.abs(mu_i), 1e-6)
    amo = jnp.maximum(jnp.abs(mu_o), 1e-6)
    phase = med.phase_eval(med.HG, gm.beta_r, wi, wo)
    refl = mu_i * mu_o > 0
    f_r = albedo * (phase * jnp.abs(mu_i) / (ami + amo))[..., None] \
        * (1.0 - jnp.exp(-tau * (1.0 / ami + 1.0 / amo)[..., None]))
    # transmission (singular branch at |μi| == |μo| handled with the
    # limit form τd/μo · e^{-τd/μo})
    diff = ami - amo
    safe = jnp.abs(diff) > 1e-4
    f_t_reg = albedo * (phase * ami / jnp.where(safe, diff, 1.0))[..., None] \
        * (jnp.exp(-tau / ami[..., None]) - jnp.exp(-tau / amo[..., None]))
    f_t_lim = albedo * phase[..., None] * (tau / amo[..., None]) \
        * jnp.exp(-tau / amo[..., None])
    f_t = jnp.where(safe[..., None], f_t_reg, f_t_lim)
    f = jnp.where(refl[..., None], f_r, jnp.where((mu_i * mu_o < 0)[..., None],
                                                  f_t, 0.0))
    return jnp.maximum(f, 0.0) * amo[..., None]


def _p_spec(gm, wi):
    tau, _ = _tau_albedo(gm)
    ami = jnp.maximum(jnp.abs(wi[..., 2]), 1e-6)
    return jnp.exp(-tau / ami[..., None]) @ jnp.asarray(LUM)


class HK:
    @staticmethod
    def eval_pdf(gm, wi, wo, aux):
        f = _single_scatter(gm, wi, wo)
        p_s = _p_spec(gm, wi)
        pdf = med.phase_eval(med.HG, gm.beta_r, wi, wo) * (1.0 - p_s)
        return f, pdf

    @staticmethod
    def sample(gm, wi, u_lobe, u2, u2b, aux):
        n = wi.shape[:-1]
        tau, _ = _tau_albedo(gm)
        ami = jnp.maximum(jnp.abs(wi[..., 2]), 1e-6)
        p_s = _p_spec(gm, wi)
        choose_delta = u_lobe < p_s

        wo_ph, pdf_ph = med.phase_sample(med.HG, gm.beta_r, wi, u2)
        wo_delta = -wi
        wo = jnp.where(choose_delta[..., None], wo_delta, wo_ph)

        w_delta = jnp.exp(-tau / ami[..., None]) \
            / jnp.maximum(p_s, 1e-9)[..., None]
        f = _single_scatter(gm, wi, wo_ph)
        pdf_gl = pdf_ph * (1.0 - p_s)
        w_gloss = f / jnp.maximum(pdf_gl, 1e-9)[..., None]
        weight = jnp.where(choose_delta[..., None], w_delta, w_gloss)
        pdf = jnp.where(choose_delta, p_s, pdf_gl)
        return wo, weight, pdf, choose_delta, jnp.ones(n, jnp.float32)


HK_KIND = 21
R.register(HK_KIND, HK)

"""Per-lobe Marschner ablation (VERDICT r4 item 3).

1. Linearity: the Marschner eval is linear in the azimuthal tables, so
   eval(R-only) + eval(TT-only) + eval(TRT-only) == eval(full) exactly
   (the specular part; the diffuse term is lobe-independent and must be
   subtracted) — validates that table masking IS per-lobe ablation.
2. Golden gate: the committed artifacts/golden/ablations/metrics.json
   (tools/render_ablations.py vs the reference's committed
   R/TT/TRT-only renders, straight-hair/results/) keeps each lobe's
   tone-ratio-vs-full within ±20% of the reference's.
"""
import json
import os

import jax.numpy as jnp
import numpy as np
import pytest

from hairpt.models.bsdf import registry as R
from hairpt.models.bsdf import hair  # noqa: F401

from test_bsdf import make_gm, fixed_wi, make_hair_aux

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
METRICS = os.path.join(REPO, "artifacts", "golden", "ablations",
                       "metrics.json")


def _masked(aux, lobe):
    import sys
    sys.path.insert(0, os.path.join(REPO, "tools"))
    from render_ablations import mask_tables
    return mask_tables(aux, lobe)


@pytest.mark.parametrize("kind", [R.MARSCHNER, R.MARSCHNER_PURE])
def test_lobe_masking_linearity(kind):
    n = 512
    aux = make_hair_aux()
    if aux.values_quad is None:
        aux = aux._replace(values_quad=hair.quad_pack(aux.values))
    gm = make_gm(n, kind=kind, sigma_a=(0.5, 0.5, 0.5), beta_r=0.1,
                 eta=1.55, aux_id=0, diffuse=(0.0, 0.0, 0.0))
    wi = fixed_wi(n, 40.0)
    rs = np.random.RandomState(3)
    d = rs.randn(n, 3)
    wo = jnp.asarray(d / np.linalg.norm(d, axis=-1, keepdims=True),
                     jnp.float32)
    f_full, _ = R.eval_pdf([kind], gm, wi, wo, _masked(aux, None))
    parts = [np.asarray(R.eval_pdf([kind], gm, wi, wo,
                                   _masked(aux, lb))[0])
             for lb in (0, 1, 2)]
    np.testing.assert_allclose(sum(parts), np.asarray(f_full),
                               rtol=1e-4, atol=1e-6)


def test_ablation_golden_gate():
    assert os.path.exists(METRICS), \
        "run tools/render_ablations.py and commit the artifacts"
    with open(METRICS) as f:
        m = json.load(f)
    for lobe in ("r", "tt", "trt"):
        assert m[lobe]["ratio_rel_err"] <= 0.20, (lobe, m[lobe])
        # highlight band centroid within 15% of frame height
        assert m[lobe]["band_abs_err"] <= 0.15, (lobe, m[lobe])

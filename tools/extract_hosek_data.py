"""One-time extraction of the Hosek-Wilkie sky-model RGB datasets.

The coefficients are PUBLISHED RESEARCH DATA from the supplemental
material of Hosek & Wilkie, "An Analytic Model for Full Spectral Sky-Dome
Radiance" (SIGGRAPH 2012), distributed by the authors and vendored
verbatim by Mitsuba (src/emitters/sunsky/skymodeldata.h) and many other
renderers. This script parses the numeric arrays out of that header into
hairpt/data/hosek_rgb.npz (data only — no code is taken).

Layout per channel (standard ArHosekSkyModel):
  dataset    [2 albedos, 10 turbidities, 6 elevation ctrl pts, 9 coeffs]
  datasetRad [2 albedos, 10 turbidities, 6 elevation ctrl pts]
"""
import os
import re

import numpy as np

SRC = "/root/reference/src/emitters/sunsky/skymodeldata.h"
OUT = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "hairpt", "data", "hosek_rgb.npz")


def parse_array(text: str, name: str) -> np.ndarray:
    m = re.search(rf"double {name}\[\]\s*=\s*\{{(.*?)\}};", text,
                  re.DOTALL)
    if not m:
        raise KeyError(name)
    body = re.sub(r"//[^\n]*", "", m.group(1))  # strip line comments
    vals = [float(x) for x in re.split(r"[,\s]+", body.strip()) if x]
    return np.array(vals, np.float64)


def main():
    with open(SRC) as f:
        text = f.read()
    data = {}
    for ch, name in enumerate(["RGB1", "RGB2", "RGB3"]):
        d = parse_array(text, f"dataset{name}")
        r = parse_array(text, f"datasetRGBRad{ch + 1}")
        assert d.size == 2 * 10 * 6 * 9, d.size
        assert r.size == 2 * 10 * 6, r.size
        data[f"coeff{ch}"] = d.reshape(2, 10, 6, 9).astype(np.float32)
        data[f"rad{ch}"] = r.reshape(2, 10, 6).astype(np.float32)
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    np.savez_compressed(OUT, **data)
    print(f"wrote {OUT} ({os.path.getsize(OUT)} bytes)")


if __name__ == "__main__":
    main()

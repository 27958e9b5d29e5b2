"""Extract the published atmospheric/solar data tables used by the
Preetham sun model from the reference header into hairpt/data/sun_spectra.npz.

Provenance: the arrays in /root/reference/src/emitters/sunsky/sunmodel.h
are the published constants of Preetham, Shirley & Smits, "A Practical
Analytic Model for Daylight" (SIGGRAPH '99) — ozone (k_o), mixed-gas
(k_g) and water-vapor (k_wa) absorption coefficients plus the
extraterrestrial solar spectrum (NASA/Bird-Riordan data). They are
scientific datasets, not code (same treatment as the Hosek-Wilkie
dataset, tools/extract_hosek_data.py); the evaluation code in
hairpt/models/emitters.py is written from the paper's formulas.

Run:  python tools/extract_sun_data.py
"""
import os
import re

import numpy as np

SRC = "/root/reference/src/emitters/sunsky/sunmodel.h"
OUT = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "hairpt", "data", "sun_spectra.npz")


def extract_array(text: str, name: str) -> np.ndarray:
    m = re.search(rf"Float\s+{name}\[\d+\]\s*=\s*\{{(.*?)\}};", text,
                  re.S)
    assert m, name
    vals = [float(x) for x in re.findall(r"[-+0-9.eE]+f?",
                                         m.group(1).replace("f", ""))]
    return np.asarray(vals, np.float64)


def main():
    with open(SRC) as f:
        text = f.read()
    arrays = {}
    for name in ("k_oWavelengths", "k_oAmplitudes", "k_gWavelengths",
                 "k_gAmplitudes", "k_waWavelengths", "k_waAmplitudes",
                 "solWavelengths", "solAmplitudes"):
        arrays[name] = extract_array(text, name)
    np.savez(OUT, **arrays)
    for k, v in arrays.items():
        print(k, v.shape, v[:3])
    print("wrote", OUT)


if __name__ == "__main__":
    main()

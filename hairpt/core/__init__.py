from . import math as vmath
from . import rng, warps, spectrum, quad, distribution

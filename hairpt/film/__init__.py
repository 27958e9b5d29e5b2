from .rfilter import FILTERS, filter_eval
from .film import Film, splat_samples, develop

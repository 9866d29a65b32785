from .options import CDOptions, IterLassoOptions
from . import helpers

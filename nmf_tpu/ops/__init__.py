from . import safemath, sh, tonemap, grid_sample, masked

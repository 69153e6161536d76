from .tensorf import TensoRFShade, init_tensorf_shade

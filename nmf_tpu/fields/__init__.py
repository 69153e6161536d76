from .tensorf import TensorVMSplit, FactorGrid

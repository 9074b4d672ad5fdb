"""Pure, deterministic kernels shared by the Dataset stages."""

"""Device kernels (JAX/Pallas): banded affine DP, KDE convolution, homology scans."""

"""Columnar scalar functions + pandas-UDF kernels (codecs, spectral)."""

"""Column-expression libraries and driver-side utilities."""

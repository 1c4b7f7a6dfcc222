"""Kernel modules: windowing grid, range functions, aggregations, binary ops."""

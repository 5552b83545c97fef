"""Operator modules: grouped reductions, rolling windows, reshaping."""

"""Scalar function library — all JVM-side Column expressions (no Python
UDFs in any hot path)."""

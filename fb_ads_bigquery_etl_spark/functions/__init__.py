"""Scalar/array function library (JVM-side expressions, no Python UDFs)."""

"""Benchmark systems and drivers."""

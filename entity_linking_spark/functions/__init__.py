"""Scalar function library: similarity measures and text analysis columns."""

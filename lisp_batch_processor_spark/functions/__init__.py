"""Scalar/array helper expressions shared across operators."""

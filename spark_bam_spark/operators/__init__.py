"""Analytic operator implementations built on the format layer."""

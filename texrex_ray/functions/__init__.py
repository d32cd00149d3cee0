"""Scalar / vectorized helper functions shared by the stages."""

"""Utilities: checkpoint conversion, visualization, misc helpers."""

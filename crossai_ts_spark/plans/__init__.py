"""Execution plans: per-partition checkpoint manifests + resume."""

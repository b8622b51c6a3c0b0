"""Utilities: deterministic level sampling, timing instrumentation."""

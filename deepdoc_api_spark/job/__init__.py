"""Spark layer: session, distributed pipeline, checkpoint/resume."""

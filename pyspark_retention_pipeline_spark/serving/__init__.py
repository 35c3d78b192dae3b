"""Serving tier — library-first online inference (reference serve_api parity)."""

from .api import ChurnScorer, create_app

__all__ = ["ChurnScorer", "create_app"]

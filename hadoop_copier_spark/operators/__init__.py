"""Custom operators Spark lacks natively, composed from DataFrame ops
(SURVEY §4.2 'needs custom work')."""

from .asof import asof_join  # noqa: F401

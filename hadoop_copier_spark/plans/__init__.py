"""Physical-plan inspection helpers (SURVEY §4.2: verify via explain, do
not reimplement)."""

from .inspect import explain_str, plan_has  # noqa: F401

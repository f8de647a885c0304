"""L10: observability (SURVEY.md §1)."""
from blink.obs.log import JsonlLogger
from blink.obs.profile import annotate, timed, trace

__all__ = ["JsonlLogger", "annotate", "timed", "trace"]

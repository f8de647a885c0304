"""blink — a TPU-native differentiable ray tracer.

Brand-new build with the capability surface of bindingflare/bling (whose
reference mount is empty — see SURVEY.md §0; BASELINE.json is the spec of
record). Layer map in SURVEY.md §1; component inventory in §2.
"""

__version__ = "0.1.0"

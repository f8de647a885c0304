"""L8: CPU reference & validation oracle (SURVEY.md §1)."""
from blink.ref.fd import fd_grad
from blink.ref.renderer import ref_render

__all__ = ["fd_grad", "ref_render"]

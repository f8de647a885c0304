"""Test harness config (SURVEY.md §4).

CI tests run on the CPU backend with 8 virtual devices so the full
shard_map/psum code path is exercised without a pod (§4.7), and so compile
times stay in milliseconds (axon remote-compile takes tens of seconds —
§0.3). On-device TPU tests live in tests/tpu/ and are excluded here; run
them with `python -m pytest tests/tpu/` (they switch back to the TPU).

NOTE this environment pre-imports jax in sitecustomize with the axon TPU
plugin and JAX_PLATFORMS=axon, so env vars are too late — the backend must
be forced via jax.config BEFORE any backend is initialized (verified: this
works post-import as long as no device has been touched).
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "src"))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

collect_ignore = ["tpu"]

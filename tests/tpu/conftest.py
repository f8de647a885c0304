"""TPU test tier: undo the parent conftest's CPU forcing (it runs first;
config is re-set here before any backend is initialized)."""
import jax

jax.config.update("jax_platforms", "axon")

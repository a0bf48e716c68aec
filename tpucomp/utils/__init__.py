def honor_jax_platforms_env() -> None:
    """Re-assert the JAX_PLATFORMS env var over this container's sitecustomize.

    The axon sitecustomize force-registers the remote-TPU backend and sets
    ``jax_platforms="axon,cpu"`` at interpreter start, silently overriding the
    environment variable.  Scripts that must run on the virtual CPU mesh (tests,
    multi-device sims) call this right after importing jax.
    """
    import os

    want = os.environ.get("JAX_PLATFORMS", "")
    if want and "axon" not in want:
        import jax
        jax.config.update("jax_platforms", want)

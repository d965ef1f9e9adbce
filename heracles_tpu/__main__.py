"""``python -m heracles_tpu`` entry point (reference __main__.py:21-25)."""

import os
import sys


def _pin_platform():
    """Make JAX_PLATFORMS authoritative for CLI runs.

    Some environments patch JAX to prepend their own platform plugin
    regardless of JAX_PLATFORMS; for the CLI the user's choice wins.
    """
    platforms = os.environ.get("JAX_PLATFORMS")
    if platforms:
        import jax

        jax.config.update("jax_platforms", platforms)


if __name__ == "__main__":
    _pin_platform()
    from .cli import main

    sys.exit(main())

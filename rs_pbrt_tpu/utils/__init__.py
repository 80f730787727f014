from . import vecmath, transform, spectrum, rng, u64  # noqa: F401

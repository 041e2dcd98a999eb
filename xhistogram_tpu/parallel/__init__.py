from .sharded import histogram_sharded, reduce_spec  # noqa: F401

from .sharding import ShardedQueryEngine, make_mesh, stack_shard_tables  # noqa: F401

"""Multi-chip parallelism: stream sharding, indexed chunk-parallel decode, multihost."""

"""Multi-chip parallelism: stream sharding, speculative chunked decode, multihost."""

"""Multi-chip execution: row-sharded queries over a jax.sharding.Mesh."""

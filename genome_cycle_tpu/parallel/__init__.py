"""Device-mesh parallelism: ensemble replica axis + spatial bead sharding."""

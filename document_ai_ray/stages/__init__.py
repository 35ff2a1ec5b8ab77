"""Pipeline stages: each is a plain function or callable class designed
for ``Dataset.map_batches`` (stateless -> tasks, stateful -> actor pools)."""

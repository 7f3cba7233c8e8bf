"""map_batches-ready batch transforms (stateless fns) and actor classes
(stateful, init-once-per-actor) for the Dataset pipelines."""

from .sharding import MeshConfig, ShardedPredictor, shard_inputs, shard_weights

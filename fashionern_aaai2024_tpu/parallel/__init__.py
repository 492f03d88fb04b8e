from fashionern_aaai2024_tpu.parallel.mesh import (
    MeshSpec,
    create_mesh,
    data_sharding,
    replicated_sharding,
    shard_batch,
)

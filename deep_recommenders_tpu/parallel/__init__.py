from deep_recommenders_tpu.parallel.distributed import (
    initialize as initialize_distributed,
)
from deep_recommenders_tpu.parallel.mesh import (
    MeshConfig,
    create_mesh,
    get_default_mesh,
    set_default_mesh,
)
from deep_recommenders_tpu.parallel.sharding import (
    DATA_AXIS,
    MODEL_AXIS,
    batch_sharding,
    host_array,
    replicate_on_mesh,
    replicated,
    shard_batch,
    table_sharding,
    with_sharding,
)

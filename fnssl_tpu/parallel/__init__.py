from fnssl_tpu.parallel.mesh import (
    make_mesh, batch_sharding, replicated_sharding, shard_batch,
    replicate_params, host_local_slice)
from fnssl_tpu.parallel.distributed import (
    initialize, is_primary, sync_global_devices, broadcast_from_primary)

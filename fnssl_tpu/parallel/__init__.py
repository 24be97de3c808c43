from fnssl_tpu.parallel.mesh import (
    make_mesh, make_mesh_2d, batch_sharding, replicated_sharding,
    shard_batch, replicate_params, host_local_slice, freq_sharded_input)
from fnssl_tpu.parallel.distributed import (
    initialize, is_primary, sync_global_devices, broadcast_from_primary)

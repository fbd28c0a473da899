from hashnerf_tpu.ops.hashing import spatial_hash, BOX_OFFSETS, HASH_PRIMES
from hashnerf_tpu.ops.hash_encoding import (
    HashGridConfig,
    init_hash_table,
    hash_encode,
    level_resolutions,
)
from hashnerf_tpu.ops.sh_encoding import sh_encode
from hashnerf_tpu.ops.positional import PositionalConfig, positional_encode
from hashnerf_tpu.ops.sampling import stratified_z_vals, perturb_z_vals, sample_pdf
from hashnerf_tpu.ops.volume import raw2outputs

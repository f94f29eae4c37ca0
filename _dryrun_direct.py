import jax
jax.config.update('jax_platforms', 'cpu')
jax.config.update('jax_num_cpu_devices', 8)
from vln_bevbert_tpu.utils.cache import enable_persistent_cache
enable_persistent_cache('/root/repo/tests/.jax_cache')
import __graft_entry__ as g
g._dryrun_impl(8)

from . import mesh, ntt_sharded

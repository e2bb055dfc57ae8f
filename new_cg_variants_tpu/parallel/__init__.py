from .contexts import ColShardContext, RowShardContext
from .dist import dist_run, dist_solve, initialize_multihost, make_mesh

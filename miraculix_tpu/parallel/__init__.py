"""Multi-chip / multi-host layer: SNP-sharded genotype linear algebra over
a jax device mesh (new capability — the reference is single-node)."""
from .sharded import (ShardedGeno, make_mesh, shard_genotypes,
                      shard_genotypes_from_bed, sharded_cg_solve,
                      sharded_dgemm, sharded_grm, sharded_grm_matvec)

__all__ = [
    "ShardedGeno",
    "make_mesh",
    "shard_genotypes",
    "shard_genotypes_from_bed",
    "sharded_cg_solve",
    "sharded_dgemm",
    "sharded_grm",
    "sharded_grm_matvec",
]

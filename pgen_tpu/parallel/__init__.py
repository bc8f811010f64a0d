from pgen_tpu.parallel.shard import filter_to_vcf_sharded, plan_shards

__all__ = ["filter_to_vcf_sharded", "plan_shards"]

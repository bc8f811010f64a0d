from pgen_tpu.pipeline.filter import filter_to_vcf
from pgen_tpu.pipeline.query import query_metadata

__all__ = ["filter_to_vcf", "query_metadata"]

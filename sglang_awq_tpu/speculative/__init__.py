from sglang_awq_tpu.speculative.ngram import NgramCache

__all__ = ["NgramCache"]

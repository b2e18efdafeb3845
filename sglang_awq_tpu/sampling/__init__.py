from sglang_awq_tpu.sampling.sampling_params import SamplingParams

__all__ = ["SamplingParams"]

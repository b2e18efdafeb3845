from sglang_awq_tpu.eplb.expert_distribution import (  # noqa: F401
    ExpertDistributionRecorder,
    rebalance_order,
)

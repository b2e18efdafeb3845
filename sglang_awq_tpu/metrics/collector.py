"""Prometheus metrics.

Role model: reference `python/sglang/srt/metrics/collector.py:221`
(`SchedulerMetricsCollector`: running reqs, token usage, cache hit rate,
generation throughput) and the TokenizerMetricsCollector's TTFT/ITL/e2e
histograms, exported from `/metrics` under `--enable-metrics`.
"""

from __future__ import annotations

import time
from typing import Optional

try:
    from prometheus_client import (
        CollectorRegistry,
        Counter,
        Gauge,
        Histogram,
        generate_latest,
    )

    HAVE_PROM = True
except Exception:  # pragma: no cover
    HAVE_PROM = False


class SchedulerMetrics:
    def __init__(self, model_name: str = "model"):
        self.enabled = HAVE_PROM
        if not self.enabled:
            return
        self.registry = CollectorRegistry()
        labels = {"model_name": model_name}
        self.num_running = Gauge(
            "sglt_num_running_reqs", "Running requests", ["model_name"], registry=self.registry
        ).labels(**labels)
        self.num_waiting = Gauge(
            "sglt_num_waiting_reqs", "Queued requests", ["model_name"], registry=self.registry
        ).labels(**labels)
        self.token_usage = Gauge(
            "sglt_token_usage", "KV pool usage fraction", ["model_name"], registry=self.registry
        ).labels(**labels)
        self.cache_hit_rate = Gauge(
            "sglt_cache_hit_rate", "Prefix cache hit rate", ["model_name"], registry=self.registry
        ).labels(**labels)
        self.gen_tokens = Counter(
            "sglt_generation_tokens_total", "Generated tokens", ["model_name"], registry=self.registry
        ).labels(**labels)
        self.prompt_tokens = Counter(
            "sglt_prompt_tokens_total", "Prompt tokens", ["model_name"], registry=self.registry
        ).labels(**labels)
        self.num_retractions = Counter(
            "sglt_retractions_total", "Decode retractions", ["model_name"], registry=self.registry
        ).labels(**labels)
        self.ttft = Histogram(
            "sglt_time_to_first_token_seconds", "TTFT", ["model_name"],
            buckets=[0.05, 0.1, 0.2, 0.4, 0.8, 1.6, 3.2, 6.4, 12.8, 25.6],
            registry=self.registry,
        ).labels(**labels)
        self.e2e_latency = Histogram(
            "sglt_e2e_request_latency_seconds", "E2E latency", ["model_name"],
            buckets=[0.1, 0.25, 0.5, 1, 2, 4, 8, 16, 32, 64, 128],
            registry=self.registry,
        ).labels(**labels)
        # speculative decoding (reference spec_accept_length gauge)
        self.spec_accept_length = Gauge(
            "sglt_spec_accept_length",
            "Mean accepted tokens per speculative verify step",
            ["model_name"], registry=self.registry,
        ).labels(**labels)
        self.hicache_hit_pages = Counter(
            "sglt_hicache_restored_pages_total",
            "KV pages restored from the host tier",
            ["model_name"], registry=self.registry,
        ).labels(**labels)
        # cumulative counters for hit-rate
        self._cached_tokens = 0
        self._total_prompt_tokens = 0

    def observe_finish(self, req, now: Optional[float] = None):
        if not self.enabled:
            return
        now = now or time.monotonic()
        self.gen_tokens.inc(len(req.output_ids))
        self.prompt_tokens.inc(len(req.input_ids))
        self._cached_tokens += req.prefix_len
        self._total_prompt_tokens += len(req.input_ids)
        if self._total_prompt_tokens:
            self.cache_hit_rate.set(self._cached_tokens / self._total_prompt_tokens)
        if req.first_token_time and req.queued_time:
            self.ttft.observe(req.first_token_time - req.queued_time)
        if req.queued_time:
            self.e2e_latency.observe(now - req.queued_time)

    def set_queue_state(self, running: int, waiting: int, token_usage: float):
        if not self.enabled:
            return
        self.num_running.set(running)
        self.num_waiting.set(waiting)
        self.token_usage.set(token_usage)

    def render(self) -> bytes:
        if not self.enabled:
            return b"# prometheus_client not available\n"
        return generate_latest(self.registry)

"""CPU orchestration: request lifecycle, continuous-batching scheduler,
tokenize/detokenize (reference L2/L3 — SURVEY.md §2.2).

The reference runs these as separate processes bridged by ZMQ; on TPU one
process per host drives all local chips (SPMD), so they collapse into
threads + queues (SURVEY.md §2.6 TPU-native equivalent).
"""

"""KV memory management: paged allocator, radix prefix cache, device pool.

Re-creates the reference's L4 layer (SURVEY.md §2.3):
  allocator.py   page allocator (reference mem_cache/allocator.py:411 semantics,
                 host-side numpy instead of device kernels)
  radix_cache.py token-space radix tree over KV pages (reference
                 mem_cache/radix_cache.py:252; page-aligned keys)
  kv_pool.py     the device-resident paged KV arrays + sizing
"""

from sglang_awq_tpu.mem_cache.allocator import PagedAllocator
from sglang_awq_tpu.mem_cache.radix_cache import RadixCache

__all__ = ["PagedAllocator", "RadixCache"]

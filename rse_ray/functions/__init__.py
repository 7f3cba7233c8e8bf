"""Pure, Ray-free kernels: tokenization, posting codecs, HTML extraction,
hashing/sketching. Everything here is deterministic and unit-testable
without a cluster; the stages/ and pipelines/ layers wrap these in
``map_batches`` calls.
"""

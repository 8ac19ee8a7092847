"""Structured Streaming surface.

The reference is cron-batch (SURVEY §2.9) and the engine's correctness story
is the batch-iterative round loop (crawl/scheduler.py).  This package adds
the optional streaming ingestion surface: new page files appearing under a
directory are processed incrementally through the same template pipeline.
"""

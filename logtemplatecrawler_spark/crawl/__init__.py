"""The URL-frontier + fetch scheduler.

The reference's frontier is the Postgres ``repositories`` state machine
(postgres_db.sql:109-129) driven by cron DAGs with LIMIT-1/20 work leases
(S8/O4) and a `locked` flag for mutual exclusion.  Here the frontier is a
checkpointed table and each micro-batch round is one deterministic Spark job:

    pending → robots gate → per-host politeness pop (salted windowed
    priority queue) → fetch (join against the pages table) → template
    pipeline → link discovery → URL-seen anti-join → state transitions →
    checkpoint (frontier snapshot + templates delta + metrics + MANIFEST)

No locks: Spark's deterministic task partitioning + atomic per-round commit
(MANIFEST written last) replace the reference's `locked` lease, and resume
is "start from the last round with a MANIFEST".
"""

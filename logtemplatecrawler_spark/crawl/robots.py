"""robots.txt gating as a host-level predicate table.

robots(host, disallow_prefix) is aggregated to one array-of-prefixes row per
host (tiny vs the frontier) and broadcast-joined; a URL is blocked when its
path starts with any disallowed prefix.  '/' disallows the whole host.

The reference has no robots handling (it crawls the GitHub API); this is a
north-rule requirement and follows the standard longest-prefix-free
interpretation: any matching Disallow prefix blocks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def robots_prefixes(robots: DataFrame) -> DataFrame:
    """robots(host, disallow_prefix) → (host, disallow_prefixes array)."""
    return robots.groupBy("host").agg(
        F.collect_list("disallow_prefix").alias("disallow_prefixes")
    )


def with_robots_blocked(frontier_like: DataFrame, robots: DataFrame) -> DataFrame:
    """Add a boolean ``robots_blocked`` column (URLs on unlisted hosts pass)."""
    prefixes = robots_prefixes(robots)
    path = F.coalesce(F.parse_url(F.col("url"), F.lit("PATH")), F.lit("/"))
    blocked = F.when(
        F.col("disallow_prefixes").isNull(), F.lit(False)
    ).otherwise(
        F.exists("disallow_prefixes", lambda p: path.startswith(p))
    )
    return (
        frontier_like.join(F.broadcast(prefixes), "host", "left")
        .withColumn("robots_blocked", blocked)
        .drop("disallow_prefixes")
    )

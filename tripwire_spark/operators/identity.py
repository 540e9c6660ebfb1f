"""Identity lifecycle operators: claim allocation (O2), name
sanitization (F13), and the raw-mail backup sink (S6).

Reference parity:
- O2 claim-next-identity: runners/common_queries.py:237-250
  (get_brand_new_iid) — the lowest free iid per ("group", "type") with
  enabled AND NOT used AND verified AND NOT in_use, excluding iids
  already present in url_id_assignments (J5 anti join), one per
  demanding job.  The serial ORDER BY iid ASC LIMIT 1 FOR UPDATE loop
  is replayed as a rank-and-zip: free identities ranked by iid within
  (group, type), demand ranked by its arrival key, equi-joined on rank.
- F13 name sanitization: runners/common_utils.py:242-246 — group/type
  names must match [a-zA-Z0-9_-]+ or the job aborts.
- S6 eml.gz backup sink: mail/mailhandler/handle_email.py:76-96 —
  messages archived under by-username/<initial>/<username>/ ; the Spark
  sink is a parquet write partitioned by (initial, username), which
  reproduces the same directory fan-out without per-file driver loops.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# common_utils.py:242-246
_VALID_NAME = r"^[a-zA-Z0-9_-]+$"


def name_valid(name_col: Column | str) -> Column:
    """F13: True iff the group/type name has no invalid characters."""
    c = F.col(name_col) if isinstance(name_col, str) else name_col
    return c.rlike(_VALID_NAME)


def sanitize_names(df: DataFrame, cols: list[str]) -> DataFrame:
    """Drop rows whose group/type names contain invalid characters —
    the batch analog of the AbortException guard."""
    keep = F.lit(True)
    for c in cols:
        keep = keep & name_valid(c)
    return df.filter(keep)


def claim_identities(
    demand: DataFrame,
    identities: DataFrame,
    assignments: DataFrame | None = None,
    group_col: str = "id_group",
    type_col: str = "id_type",
    demand_order: list[str] | None = None,
) -> DataFrame:
    """O2: allocate the lowest free iid per (group, type) to each
    demanding row, FIFO (common_queries.py:237-250).

    ``demand``: one row per job needing an identity, carrying
    (group_col, type_col, *demand keys).  ``identities``: rows with
    (iid, group_col, type_col, enabled, used, verified, in_use).
    ``assignments`` (optional): iids already mapped — excluded via
    anti join (J5, common_queries.py:242-244).

    The serial claim loop's outcome (k-th demand in arrival order gets
    the k-th lowest free iid) is reproduced exactly by double ranking —
    one window per side, one equi-join on (group, type, rank); no
    locking, no driver loop.  Demands beyond the free supply get no row
    (the reference returns None).
    """
    free = identities.filter(
        F.col("enabled") & ~F.col("used") & F.col("verified") & ~F.col("in_use")
    )
    if assignments is not None:
        free = free.join(assignments.select("iid"), "iid", "left_anti")
    iw = Window.partitionBy(group_col, type_col).orderBy(F.col("iid").asc())
    ranked_ids = free.select(
        group_col, type_col, "iid", F.row_number().over(iw).alias("__rank")
    )
    order = [F.col(c) for c in (demand_order or ["demand_id"])]
    dw = Window.partitionBy(group_col, type_col).orderBy(*order)
    ranked_demand = demand.withColumn("__rank", F.row_number().over(dw))
    return (
        ranked_demand.join(ranked_ids, [group_col, type_col, "__rank"], "inner")
        .drop("__rank")
    )


def sticky_assignments(
    claimed_hosts: DataFrame,
    assignments: DataFrame | None,
    identities: DataFrame,
    id_group: str = "default",
    id_type: str = "default",
) -> DataFrame:
    """SURVEY §7 hard part 5: identity<->domain stickiness with
    first-claim-wins semantics under parallelism (get_iid,
    common_utils.py:240-269).

    ``claimed_hosts``: one column ``host`` (this round's claimed set).
    ``assignments``: persisted state (host, iid, id_group, id_type) or
    None on the first round.  Hosts already mapped REUSE their identity
    (get_preexisting_iid); unmapped hosts claim the lowest free
    identity in deterministic host order (the serial claim loop's
    outcome replayed by rank-and-zip) — identities already assigned are
    excluded, so no identity ever serves two domains.

    Returns the NEW assignments state (old rows + this round's claims).
    The frame is a per-host dimension (tiny next to the frontier); the
    crawl loop checkpoints it with the other state tables.
    """
    hosts = claimed_hosts.select("host").distinct()
    if assignments is not None:
        fresh_hosts = hosts.join(assignments.select("host"), "host", "left_anti")
        taken = assignments.select("iid")
    else:
        fresh_hosts = hosts
        taken = None
    demand = fresh_hosts.select(
        F.col("host"), F.lit(id_group).alias("id_group"), F.lit(id_type).alias("id_type")
    )
    claimed = claim_identities(
        demand, identities, assignments=taken, demand_order=["host"]
    ).select("host", "iid", "id_group", "id_type")
    return claimed if assignments is None else assignments.unionByName(claimed)


def eml_backup_path(username_col: Column | str) -> Column:
    """S6: the by-username/<initial>/<username> shard path
    (handle_email.py:76-96); missing usernames file under __MISSING__."""
    c = F.col(username_col) if isinstance(username_col, str) else username_col
    un = F.lower(F.coalesce(c, F.lit("__MISSING__")))
    return F.concat_ws("/", F.lit("by-username"), F.substring(un, 1, 1), un)


def backup_messages(messages: DataFrame, out_dir: str, username_col: str = "username") -> None:
    """S6 sink: archive raw messages partitioned by (initial, username).

    One distributed write replaces the reference's per-message gzip
    file; parquet already compresses the message column, and partition
    pruning by initial/username replays the directory layout."""
    un = F.lower(F.coalesce(F.col(username_col), F.lit("__MISSING__")))
    (
        messages.withColumn("__initial", F.substring(un, 1, 1))
        .withColumn("__username", un)
        .write.mode("append")
        .partitionBy("__initial", "__username")
        .parquet(out_dir)
    )

"""Semi-structured (ping-style) JSON ingestion — SURVEY.md Phase 2.

Re-expresses the reference's hand-rolled JSON→Row conversion
(``SyncPingConversion.scala``, ``SyncView.scala:64-85``, ``Events.scala:32-94``)
as a declarative Spark 4 pipeline over the VARIANT type:

raw JSON strings → ``parse_json`` → path extraction with typed casts →
required-field rejection filters (counted via ``observe``) → explodes.

Why VARIANT instead of ``from_json`` + a rigid StructType: the ping format
has two shapes the struct parser cannot express —
- ``outgoing`` may be an array of batches or a single object
  (``SyncPingConversion.scala:270-289``): handled by coalescing an
  array-typed and an object-typed ``try_variant_get`` of the same path;
- ``events`` are positional heterogeneous arrays
  ``[ts, category, method, object, stringValue?, mapValues?]``
  (``Events.scala:32-80``): handled with ``$[i]`` paths and per-element
  casts; malformed entries (wrong arity/types) yield nulls and are dropped,
  matching the reference's silent-skip semantics.

All extraction is JVM-side (no Python UDFs); at 100 TB the variant parse is
a single scan-stage projection and the explodes are narrow.

Output schemas mirror the reference's (``nestedSyncType``
``SyncPingConversion.scala:93-116``, ``singleEngineFlatSyncType`` ``:118-157``,
``syncEventSchema`` ``SyncEventView.scala:125-149``).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# --- typed cast targets (DDL strings mirroring the reference's structs) ---

FAILURE_DDL = "struct<name:string>"
STATUS_DDL = "struct<sync:string,service:string>"
INCOMING_DDL = (
    "struct<applied:bigint,failed:bigint,newFailed:bigint,reconciled:bigint>"
)
OUTGOING_DDL = "struct<sent:bigint,failed:bigint>"
DEVICE_DDL = "array<struct<id:string,version:string,os:string>>"
NAMED_COUNT_DDL = "array<struct<name:string,count:bigint>>"
STEP_DDL = (
    "array<struct<name:string,took:bigint,counts:array<struct<name:string,count:bigint>>>>"
)
VALIDATION_DDL = (
    "struct<version:bigint,checked:bigint,took:bigint,"
    "problems:array<struct<name:string,count:bigint>>>"
)


def _vget(v: Column, path: str, typ: str) -> Column:
    return F.try_variant_get(v, path, typ)


def _failure_reason(v: Column, path: str) -> Column:
    """F16 failure-reason normalization (SyncPingConversion.scala:174-191):
    struct {name, value} where value is the object's non-name detail field,
    stringified. The reference takes "the first non-name field"; our spec
    coalesces the known detail keys (value, code, error, message, from) —
    deterministic where the reference was map-order-dependent."""
    name = _vget(v, f"{path}.name", "string")
    value = F.coalesce(
        *[_vget(v, f"{path}.{k}", "string") for k in ("value", "code", "error", "message", "from")]
    )
    return F.when(
        _vget(v, path, "variant").isNotNull(),
        F.struct(name.alias("name"), value.alias("value")),
    )


def parse_pings(raw: DataFrame, json_col: str = "json") -> DataFrame:
    """JSON strings → one variant column ``v`` (+ passthrough columns)."""
    others = [c for c in raw.columns if c != json_col]
    return raw.select(*others, F.try_parse_json(F.col(json_col)).alias("v"))


def _app_os_columns(v: Column) -> list[Column]:
    """Shared app/os prefix of both sync schemas. The os block appears at
    the top level on Android pings and under payload on desktop
    (FIXTURES.md F-2); payload position wins, mirroring the reference."""
    return [
        _vget(v, "$.application.buildId", "string").alias("app_build_id"),
        _vget(v, "$.application.displayVersion", "string").alias("app_display_version"),
        _vget(v, "$.application.name", "string").alias("app_name"),
        _vget(v, "$.application.version", "string").alias("app_version"),
        _vget(v, "$.application.channel", "string").alias("app_channel"),
        F.coalesce(
            _vget(v, "$.payload.os.name", "string"), _vget(v, "$.os.name", "string")
        ).alias("os"),
        F.coalesce(
            _vget(v, "$.payload.os.version", "string"),
            _vget(v, "$.os.version", "string"),
        ).alias("os_version"),
        F.coalesce(
            _vget(v, "$.payload.os.locale", "string"),
            _vget(v, "$.os.locale", "string"),
        ).alias("os_locale"),
    ]


def _engine_struct(e: Column) -> Column:
    """One engine variant → the nested engineType struct
    (SyncPingConversion.scala:75-84). Optional numerics default 0
    (:222-238); outgoing tolerates object-instead-of-array (:270-272)."""
    outgoing = F.coalesce(
        _vget(e, "$.outgoing", f"array<{OUTGOING_DDL}>"),
        F.when(
            _vget(e, "$.outgoing", OUTGOING_DDL).isNotNull(),
            F.array(_vget(e, "$.outgoing", OUTGOING_DDL)),
        ),
    )
    # normalize outgoing entry defaults (sent/failed -> 0 when absent)
    outgoing = F.transform(
        outgoing,
        lambda o: F.struct(
            F.coalesce(o["sent"], F.lit(0)).alias("sent"),
            F.coalesce(o["failed"], F.lit(0)).alias("failed"),
        ),
    )
    incoming = F.when(
        _vget(e, "$.incoming", "variant").isNotNull(),
        F.struct(
            F.coalesce(_vget(e, "$.incoming.applied", "bigint"), F.lit(0)).alias("applied"),
            F.coalesce(_vget(e, "$.incoming.failed", "bigint"), F.lit(0)).alias("failed"),
            F.coalesce(_vget(e, "$.incoming.newFailed", "bigint"), F.lit(0)).alias("new_failed"),
            F.coalesce(_vget(e, "$.incoming.reconciled", "bigint"), F.lit(0)).alias("reconciled"),
        ),
    )
    validation = F.when(
        _vget(e, "$.validation", "variant").isNotNull(),
        F.struct(
            F.coalesce(_vget(e, "$.validation.version", "bigint"), F.lit(0)).alias("version"),
            F.coalesce(_vget(e, "$.validation.checked", "bigint"), F.lit(0)).alias("checked"),
            F.coalesce(_vget(e, "$.validation.took", "bigint"), F.lit(0)).alias("took"),
            _vget(e, "$.validation.problems", NAMED_COUNT_DDL).alias("problems"),
            _failure_reason(e, "$.validation.failureReason").alias("failure_reason"),
        ),
    )
    return F.struct(
        _vget(e, "$.name", "string").alias("name"),
        F.coalesce(_vget(e, "$.took", "bigint"), F.lit(0)).alias("took"),
        _vget(e, "$.status", "string").alias("status"),
        _failure_reason(e, "$.failureReason").alias("failure_reason"),
        incoming.alias("incoming"),
        outgoing.alias("outgoing"),
        _vget(e, "$.steps", STEP_DDL).alias("steps"),
        validation.alias("validation"),
    )


def nested_sync_view(pings: DataFrame) -> DataFrame:
    """X3 ping → N rows (one per sync): the nestedSyncType view
    (SyncPingConversion.scala:643-653 dispatch, :423-523 conversion).

    Old-style pings (sync fields directly under payload, no ``syncs`` array)
    are normalized to a one-element array before the explode. Records
    missing required fields (uid, when) are rejected — count them with
    ``nested_sync_view_observed`` (single-pass) or ``ingest_metrics``."""
    out = _nested_sync_rows(pings)
    # P9 required-field rejection (uid: SyncPingConversion.scala:468-497;
    # when: :546): drop, don't null-fill.
    return out.where(F.col("uid").isNotNull() & F.col("when").isNotNull())


def _nested_sync_rows(pings: DataFrame) -> DataFrame:
    """The nested view before required-field rejection (shared by the plain
    and observed entry points)."""
    v = F.col("v")
    syncs = F.coalesce(
        _vget(v, "$.payload.syncs", "array<variant>"),
        # old-style single-sync payload: treat payload itself as the sync
        F.when(
            _vget(v, "$.payload.when", "bigint").isNotNull(),
            F.array(_vget(v, "$.payload", "variant")),
        ),
    )
    exploded = pings.select(
        *_app_os_columns(v),
        _vget(v, "$.payload.uid", "string").alias("uid"),
        _vget(v, "$.payload.deviceID", "string").alias("device_id"),
        _vget(v, "$.payload.why", "string").alias("payload_why"),
        F.explode(syncs).alias("s"),
    )
    s = F.col("s")
    out = exploded.select(
        "app_build_id",
        "app_display_version",
        "app_name",
        "app_version",
        "app_channel",
        "os",
        "os_version",
        "os_locale",
        "uid",
        "device_id",
        _vget(s, "$.when", "bigint").alias("when"),
        F.coalesce(_vget(s, "$.took", "bigint"), F.lit(0)).alias("took"),
        _failure_reason(s, "$.failureReason").alias("failure_reason"),
        F.when(
            _vget(s, "$.status", "variant").isNotNull(),
            F.struct(
                _vget(s, "$.status.sync", "string").alias("sync"),
                _vget(s, "$.status.service", "string").alias("service"),
            ),
        ).alias("status"),
        F.coalesce(_vget(s, "$.why", "string"), F.col("payload_why")).alias("why"),
        F.transform(
            _vget(s, "$.engines", "array<variant>"), _engine_struct
        ).alias("engines"),
        _vget(s, "$.devices", DEVICE_DDL).alias("devices"),
    )
    return out


def flat_sync_view(nested: DataFrame) -> DataFrame:
    """X4 sync × engine flatten: singleEngineFlatSyncType
    (SyncPingConversion.scala:526-640) — each engine of each sync becomes a
    row carrying the sync-level prefix, with the outgoing array rolled up to
    (batch_count, total_sent, total_failed) via higher-order aggregate (F13,
    :250-289). sync_id synthesized when absent (F17, :597-600); sync_day is
    the yyyyMMdd key of ``when`` (F5, :546)."""
    e = F.col("e")
    agg_sent = F.aggregate(
        F.coalesce(e["outgoing"], F.array()),
        F.lit(0).cast("bigint"),
        lambda acc, o: acc + F.coalesce(o["sent"], F.lit(0)),
    )
    agg_failed = F.aggregate(
        F.coalesce(e["outgoing"], F.array()),
        F.lit(0).cast("bigint"),
        lambda acc, o: acc + F.coalesce(o["failed"], F.lit(0)),
    )
    prefix = [c for c in nested.columns if c not in ("engines",)]
    return (
        nested.withColumn("sync_id", F.uuid())
        .withColumn(
            "sync_day", F.date_format(F.timestamp_millis(F.col("when")), "yyyyMMdd")
        )
        .select(
            *prefix,
            "sync_id",
            "sync_day",
            F.explode_outer("engines").alias("e"),
        )
        .select(
            *prefix,
            "sync_id",
            "sync_day",
            e["name"].alias("engine_name"),
            F.coalesce(e["took"], F.lit(0)).alias("engine_took"),
            e["status"].alias("engine_status"),
            e["failure_reason"].alias("engine_failure_reason"),
            F.coalesce(e["incoming"]["applied"], F.lit(0)).alias("engine_incoming_applied"),
            F.coalesce(e["incoming"]["failed"], F.lit(0)).alias("engine_incoming_failed"),
            F.coalesce(e["incoming"]["new_failed"], F.lit(0)).alias("engine_incoming_new_failed"),
            F.coalesce(e["incoming"]["reconciled"], F.lit(0)).alias("engine_incoming_reconciled"),
            F.coalesce(F.size(e["outgoing"]), F.lit(0)).alias("engine_outgoing_batch_count"),
            F.coalesce(agg_sent, F.lit(0)).alias("engine_outgoing_batch_total_sent"),
            F.coalesce(agg_failed, F.lit(0)).alias("engine_outgoing_batch_total_failed"),
        )
    )


def events_view(pings: DataFrame, extra_cols: list[str] | None = None) -> DataFrame:
    """X5 positional heterogeneous event arrays (Events.scala:32-94,
    SyncEventView.scala:151-160): ``[ts, category, method, object,
    stringValue?, mapValues?]`` parsed with ``$[i]`` paths; entries whose
    first four elements don't parse are silently skipped (the reference's
    malformed-entry tolerance, EventsTest.scala:14-22). Map values are
    stringified with JSON-null → the literal string 'null' (F19, Bug
    1339130 semantics, Events.scala:42-58)."""
    v = F.col("v")
    ev = F.col("ev")
    exploded = pings.select(
        *(extra_cols or []),
        _vget(v, "$.payload.uid", "string").alias("uid"),
        _vget(v, "$.payload.deviceID", "string").alias("device_id"),
        F.explode(_vget(v, "$.payload.events", "array<variant>")).alias("ev"),
    )
    mv = _vget(ev, "$[5]", "map<string,variant>")
    out = exploded.select(
        *(extra_cols or []),
        "uid",
        "device_id",
        _vget(ev, "$[0]", "bigint").alias("event_timestamp"),
        _vget(ev, "$[1]", "string").alias("event_category"),
        _vget(ev, "$[2]", "string").alias("event_method"),
        _vget(ev, "$[3]", "string").alias("event_object"),
        _vget(ev, "$[4]", "string").alias("event_string_value"),
        F.transform_values(
            mv,
            lambda _k, x: F.coalesce(_vget(x, "$", "string"), F.lit("null")),
        ).alias("event_map_values"),
    )
    required = ["event_timestamp", "event_category", "event_method", "event_object"]
    cond = F.lit(True)
    for c in required:
        cond = cond & F.col(c).isNotNull()
    return out.where(cond)


def enrich_events_with_devices(events: DataFrame, nested: DataFrame) -> DataFrame:
    """J2 per-ping device-map lookup (SyncEventView.scala:216-265): attach
    (device_version, device_os) for the event's ``deviceID`` map value by
    joining the exploded device list — a proper distributed equi-join
    instead of the reference's in-closure Map lookup."""
    devices = (
        nested.select("uid", F.explode("devices").alias("d"))
        .select(
            "uid",
            F.col("d.id").alias("device_id_key"),
            F.col("d.version").alias("device_version"),
            F.col("d.os").alias("device_os"),
        )
        .dropDuplicates(["uid", "device_id_key"])
    )
    devices = devices.withColumnRenamed("uid", "device_uid")
    ev_dev = events.withColumn(
        "event_device_id", F.element_at(F.col("event_map_values"), "deviceID")
    )
    return (
        ev_dev.join(
            F.broadcast(devices),
            (ev_dev["uid"] == devices["device_uid"])
            & (ev_dev["event_device_id"] == devices["device_id_key"]),
            "left",
        )
        .drop("device_uid", "device_id_key")
    )


def nested_sync_view_observed(raw: DataFrame, json_col: str = "json"):
    """Single-pass ingestion with accumulator-style metrics (A10,
    SyncView.scala:49-51,115-117): returns ``(nested_df, observations)``
    where the two ``Observation`` objects resolve after the FIRST action on
    the returned frame — one pipeline execution yields both the data and the
    processed/failed/ignored counts, exactly like the reference's
    accumulators (vs ``ingest_metrics``'s three separate counts).

    observations: {"parse": Observation(records_total, records_failed),
                   "syncs": Observation(syncs_exploded, syncs_rejected)}."""
    from pyspark.sql import Observation

    obs_parse = Observation("ingest_parse")
    obs_syncs = Observation("ingest_syncs")

    parsed = parse_pings(raw, json_col).observe(
        obs_parse,
        F.count(F.lit(1)).alias("records_total"),
        F.sum(F.col("v").isNull().cast("long")).alias("records_failed"),
    )
    unfiltered = _nested_sync_rows(parsed)
    observed = unfiltered.observe(
        obs_syncs,
        F.count(F.lit(1)).alias("syncs_exploded"),
        F.sum(
            (F.col("uid").isNull() | F.col("when").isNull()).cast("long")
        ).alias("syncs_rejected"),
    )
    accepted = observed.where(F.col("uid").isNotNull() & F.col("when").isNotNull())
    return accepted, {"parse": obs_parse, "syncs": obs_syncs}


def ingest_metrics(raw: DataFrame, parsed: DataFrame, accepted: DataFrame) -> dict[str, int]:
    """A10 accumulator-style processed/ignored/failed counts
    (SyncView.scala:49-51,115-117), as three cheap aggregates:
    failed = unparseable JSON; ignored = parsed but rejected by required
    fields; processed = accepted rows."""
    total = raw.count()
    parse_ok = parsed.where(F.col("v").isNotNull()).count()
    accepted_n = accepted.count()
    return {
        "records_total": total,
        "records_failed": total - parse_ok,
        "records_ignored": parse_ok - min(accepted_n, parse_ok),
        "rows_processed": accepted_n,
    }

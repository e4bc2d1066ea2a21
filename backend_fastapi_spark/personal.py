"""Personal-state tables backing the assistant tool surface — SURVEY §2.10 L3.

The reference keeps per-user assistant state (diseases, medications,
calendar, finance items, notifications) in MariaDB and mutates it row-at-a-
time from the tool executor (``tool_executor.py:136-554``). The Spark-native
analog is a set of small dimension DataFrames mutated by *batch merges*
(``operators/crud.py``: upsert = union + keep-newest-per-key, delete =
anti-join) — the CDC shape that scales from one user to a 100 TB user base:
every mutation is a key-partitioned merge, every read a filter on
``user_id`` (partition-prunable when persisted partitioned by a user-id
bucket).

State lives in the store as current-image DataFrames; mutations reassign
the image. Nothing here touches a driver-side loop — seeds are expressed
over ``spark.range`` so a 10^9-user bootstrap would distribute.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from backend_fastapi_spark.operators import crud


def _seeded(spark: SparkSession, n_users: int, per_user: int) -> DataFrame:
    """(user_id, seq) grid — the deterministic seed substrate. One flat
    ``range(n_users·per_user)`` with divmod arithmetic, not a range×range
    crossJoin: same rows, no nested-loop join in the plan, and the flat
    range splits evenly across executors at any n_users."""
    return spark.range(n_users * per_user).select(
        (F.floor(F.col("id") / per_user) + 1).cast("long").alias("user_id"),
        (F.col("id") % per_user).alias("seq"),
    )


@dataclass
class PersonalStore:
    """Current-image personal tables + batch-merge mutations.

    Tool analogs (reference ``tool_executor.py``):
      diseases/medications  — :168-238 (get), :239-325 (add)
      calendar_events       — :380-470 (get/add), :526-554 (delete)
      finance_items         — :326-379
      notifications         — :591-640
    """

    spark: SparkSession
    diseases: DataFrame
    medications: DataFrame
    calendar_events: DataFrame
    finance_items: DataFrame
    notifications: DataFrame
    _version: int = field(default=0)

    @classmethod
    def bootstrap(cls, spark: SparkSession, n_users: int = 5) -> "PersonalStore":
        """Deterministic seed state — same rows every run, derived from
        (user_id, seq) arithmetic, no RNG, no clock."""
        d_names = F.array(
            F.lit("hypertension"), F.lit("diabetes"), F.lit("asthma")
        )
        diseases = _seeded(spark, n_users, 2).select(
            "user_id",
            (F.col("user_id") * 10 + F.col("seq")).alias("disease_id"),
            F.element_at(d_names, ((F.col("user_id") + F.col("seq")) % 3 + 1).cast("int")).alias("name"),
            F.date_format(
                F.date_add(F.lit("2024-01-01").cast("date"), (F.col("user_id") * 7 + F.col("seq") * 30).cast("int")),
                "yyyy-MM-dd",
            ).alias("diagnosed_date"),
            F.when(F.col("seq") == 0, "active").otherwise("controlled").alias("status"),
            F.lit(0).alias("version"),
        )
        m_names = F.array(F.lit("metformin"), F.lit("lisinopril"), F.lit("inhaler"))
        medications = _seeded(spark, n_users, 2).select(
            "user_id",
            (F.col("user_id") * 10 + F.col("seq")).alias("med_id"),
            F.element_at(m_names, ((F.col("user_id") + F.col("seq")) % 3 + 1).cast("int")).alias("name"),
            F.concat(((F.col("seq") + 1) * 100).cast("string"), F.lit("mg")).alias("dosage"),
            F.when(F.col("seq") == 0, "08:00").otherwise("20:00").alias("intake_time"),
            F.lit(0).alias("version"),
        )
        e_types = F.array(F.lit("hospital"), F.lit("meeting"), F.lit("appointment"))
        calendar_events = _seeded(spark, n_users, 3).select(
            "user_id",
            (F.col("user_id") * 100 + F.col("seq")).alias("event_id"),
            F.concat(F.lit("event-"), F.col("user_id"), F.lit("-"), F.col("seq")).alias("title"),
            F.date_format(
                F.date_add(F.lit("2024-06-01").cast("date"), (F.col("seq") * 3).cast("int")),
                "yyyy-MM-dd",
            ).alias("event_date"),
            F.concat(F.lpad(((F.col("seq") * 5 + 9) % 24).cast("string"), 2, "0"), F.lit(":00")).alias("event_time"),
            F.element_at(e_types, (F.col("seq") % 3 + 1).cast("int")).alias("event_type"),
            F.lit(None).cast("string").alias("location"),
            F.lit(None).cast("string").alias("description"),
            F.lit(0).alias("version"),
        )
        f_cats = F.array(
            F.lit("ETF"), F.lit("stock"), F.lit("deposit"), F.lit("bond")
        )
        finance_items = _seeded(spark, n_users, 4).select(
            "user_id",
            (F.col("user_id") * 100 + F.col("seq")).alias("item_id"),
            F.concat(F.lit("asset-"), F.col("user_id"), F.lit("-"), F.col("seq")).alias("name"),
            F.element_at(f_cats, (F.col("seq") % 4 + 1).cast("int")).alias("category"),
            ((F.col("user_id") + 1) * (F.col("seq") + 1) * 1000).cast("double").alias("amount"),
            F.lit(0).alias("version"),
        )
        notifications = _seeded(spark, n_users, 4).select(
            "user_id",
            (F.col("user_id") * 100 + F.col("seq")).alias("notification_id"),
            F.when(F.col("seq") % 2 == 0, "reminder").otherwise("alert").alias("notification_type"),
            F.concat(F.lit("notif-"), F.col("user_id"), F.lit("-"), F.col("seq")).alias("title"),
            F.concat(F.lit("message "), F.col("seq")).alias("message"),
            (F.col("seq") % 3).cast("int").alias("priority"),
            (F.col("seq") % 2 == 1).alias("is_read"),
            F.timestamp_seconds(F.lit(1717200000) + F.col("seq") * 3600).alias("created_at"),
            F.lit(0).alias("version"),
        )
        return cls(
            spark=spark,
            diseases=diseases,
            medications=medications,
            calendar_events=calendar_events,
            finance_items=finance_items,
            notifications=notifications,
        )

    # -- mutations (batch merges; reference does row INSERT/DELETE) -------
    def _next_version(self) -> int:
        self._version += 1
        return self._version

    def _one_row(self, schema_of: DataFrame, row: dict) -> DataFrame:
        cols = [
            F.lit(row.get(f.name)).cast(f.dataType).alias(f.name)
            for f in schema_of.schema.fields
        ]
        return self.spark.range(1).select(*cols)

    def add_disease(
        self, user_id: int, name: str, diagnosed_date: str | None = None,
        status: str = "active",
    ) -> DataFrame:
        """tool_executor.py:239-285 — INSERT disease → keyed upsert."""
        row = {
            "user_id": user_id,
            # stable key: re-adding the same disease updates, not duplicates
            "disease_id": None,
            "name": name,
            "diagnosed_date": diagnosed_date,
            "status": status,
            "version": self._next_version(),
        }
        upd = self._one_row(self.diseases, row).withColumn(
            "disease_id", F.xxhash64(F.col("user_id"), F.col("name"))
        )
        self.diseases = crud.upsert(
            self.diseases, upd, ["user_id", "disease_id"], "version"
        )
        return upd.drop("version")

    def add_medication(
        self, user_id: int, name: str, dosage: str | None = None,
        intake_time: str | None = None,
    ) -> DataFrame:
        """tool_executor.py:286-325 — INSERT medication → keyed upsert."""
        row = {
            "user_id": user_id,
            "med_id": None,
            "name": name,
            "dosage": dosage,
            "intake_time": intake_time,
            "version": self._next_version(),
        }
        upd = self._one_row(self.medications, row).withColumn(
            "med_id", F.xxhash64(F.col("user_id"), F.col("name"))
        )
        self.medications = crud.upsert(
            self.medications, upd, ["user_id", "med_id"], "version"
        )
        return upd.drop("version")

    def add_calendar_event(
        self, user_id: int, title: str, event_date: str, event_time: str,
        event_type: str = "appointment", location: str | None = None,
        description: str | None = None,
    ) -> DataFrame:
        """tool_executor.py:420-470 — INSERT calendar event → keyed upsert."""
        row = {
            "user_id": user_id,
            "event_id": None,
            "title": title,
            "event_date": event_date,
            "event_time": event_time,
            "event_type": event_type,
            "location": location,
            "description": description,
            "version": self._next_version(),
        }
        upd = self._one_row(self.calendar_events, row).withColumn(
            "event_id",
            F.pmod(
                F.xxhash64(F.col("user_id"), F.col("title"), F.col("event_date"), F.col("event_time")),
                F.lit(2**31),
            ),
        )
        self.calendar_events = crud.upsert(
            self.calendar_events, upd, ["user_id", "event_id"], "version"
        )
        return upd.drop("version")

    def delete_calendar_event(self, user_id: int, event_id: int) -> DataFrame:
        """tool_executor.py:526-554 — ownership-checked delete → anti-join.
        Returns the rows that were deleted (pre-image)."""
        keys = self.spark.range(1).select(
            F.lit(user_id).cast("long").alias("user_id"),
            F.lit(event_id).cast("long").alias("event_id"),
        )
        deleted = self.calendar_events.join(keys, ["user_id", "event_id"], "inner")
        self.calendar_events = crud.delete_keys(
            self.calendar_events, keys, ["user_id", "event_id"]
        )
        return deleted.drop("version")

"""Catalog / DDL surface (SURVEY.md §2 Part A.5, D1-D9).

Works against the built-in ``spark_catalog`` (in-memory or Hive); the same
SQL works against an Iceberg catalog when the runtime jars are configured
(see sinks/writer.py for the format selection). The reference's dynamic
catalog registration (D8) maps to ``spark.conf.set`` calls here.

``VersionedCatalog`` (r15) additionally binds the path-addressed
VERSIONED tables (sinks/versioned.py) into the same ``db.table`` naming
plane — the reference's two-catalog topology (merge_to_minio.py:126-192
enumerates one catalog with SHOW TABLES and merges into another BY
NAME) needs name addressing on both planes, and before this registry
the versioned-table engine could only be reached by filesystem path.
"""

from __future__ import annotations

import json
import os
import uuid
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession


class VersionedCatalog:
    """Name→path registry for versioned tables: one tiny JSON file
    (``_versioned_catalog/<db>.<table>.json`` holding the table root)
    under the registry root, written with the same tmp+atomic-rename
    pattern as table commits.  The registry is METADATA-ONLY — tables
    stay self-contained at their paths (droppable, clonable, readable
    without the registry); a binding just gives pipeline flows
    (``run_merge``, the W5 strategy selector, ``CatalogManager.table``)
    a ``db.table`` handle onto them.  ONE FILE PER NAME makes every
    operation a single atomic write/unlink — concurrent registrations
    of different names cannot lose each other (no read-modify-write),
    and two racing ``replace=False`` registrations of the SAME name
    settle by ``os.link``'s fail-if-exists contract (the same O_EXCL
    primitive table commits use): exactly one wins, the loser gets a
    clean error naming the winner's path.  Names are normalized to
    LOWERCASE (Spark identifiers are case-insensitive, and the two
    planes must agree on resolution); the validator keeps the
    name↔filename mapping trivial.  Every register/unregister also
    appends one line to ``_versioned_catalog/_changes.jsonl`` — the
    registry's own change feed (``history()``), so pipelines can react
    to bindings appearing/moving/dropping the way they react to table
    commits."""

    def __init__(self, root: str | Path):
        self.root = Path(root)
        self._dir = self.root / "_versioned_catalog"

    def _entry(self, name: str) -> Path:
        return self._dir / f"{self._check(name)}.json"

    def _read(self, name: str) -> str | None:
        try:
            return json.loads(self._entry(name).read_text())["path"]
        except OSError:
            return self._read_legacy_case(name)
        except (ValueError, KeyError):
            return None

    def _read_legacy_case(self, name: str) -> str | None:
        """Pre-r16 registries persisted binding files under the
        caller's case; names now normalize to lowercase, so on a miss
        look for a case-insensitive filename match, migrate it to the
        lowercase name (best-effort — read-only registries still
        resolve), and serve it."""
        low = self._entry(name).name
        if not self._dir.is_dir():
            return None
        for p in self._dir.glob("*.json"):
            if p.name.lower() == low and p.name != low:
                try:
                    os.replace(p, self._dir / low)
                    p = self._dir / low
                except OSError:
                    pass
                try:
                    return json.loads(p.read_text())["path"]
                except (OSError, ValueError, KeyError):
                    return None
        return None

    @staticmethod
    def _check(name: str) -> str:
        parts = name.split(".")
        if len(parts) != 2 or not all(
            p and p.replace("_", "a").isalnum() for p in parts
        ):
            raise ValueError(
                f"versioned table name must be db.table, got {name!r}"
            )
        # Spark identifiers are case-insensitive: 'Lake.Orders' and
        # 'lake.orders' must be the SAME binding, or the versioned and
        # Spark-catalog planes can disagree on resolution
        return name.lower()

    @classmethod
    def is_name(cls, s: str) -> bool:
        """True iff ``s`` is a valid ``db.table`` name this registry
        could bind — the shared gate for APIs that accept either a name
        or a filesystem path.  NOTE: a bare relative path like
        ``backup.v2`` is indistinguishable from a name; spell relative
        paths with a separator (``./backup.v2``) where both are
        accepted."""
        try:
            cls._check(s)
        except (ValueError, AttributeError):
            return False
        return True

    def _log(self, op: str, name: str, path: str | None) -> None:
        # registry change feed: one JSON line per mutation, append-only
        # (O_APPEND single-line writes — readable while being written)
        import time

        with open(self._dir / "_changes.jsonl", "a") as fh:
            fh.write(
                json.dumps(
                    {"op": op, "name": name, "path": path, "at": time.time()}
                )
                + "\n"
            )

    def history(self, name: str | None = None) -> list[dict]:
        """The registry's own change feed: every register/unregister
        event in commit order (optionally for one name) — bindings are
        pipeline-visible events, same as table commits."""
        if name is not None:
            name = self._check(name)
        try:
            lines = (self._dir / "_changes.jsonl").read_text().splitlines()
        except OSError:
            return []
        out = []
        for ln in lines:
            try:
                ev = json.loads(ln)
            except ValueError:
                continue  # torn trailing line from a crashed writer
            if name is None or ev.get("name") == name:
                out.append(ev)
        return out

    def register(self, name: str, path: str, replace: bool = False) -> None:
        name = self._check(name)
        cur = self._read(name)
        if not replace and cur is not None and cur != str(path):
            raise ValueError(
                f"{name} is already bound to {cur}; pass "
                "replace=True to rebind"
            )
        self._dir.mkdir(parents=True, exist_ok=True)
        tmp = self._dir / f".tmp-{uuid.uuid4().hex}.json"
        tmp.write_text(json.dumps({"path": str(path)}))
        try:
            if replace or cur is not None:
                # rebinding / idempotent re-register: atomic swap
                os.replace(tmp, self._entry(name))
                tmp = None
            else:
                # CREATE: os.link fails if the entry exists, so two
                # racing replace=False creates settle like two racing
                # table commits — one wins, the loser RAISES (the
                # read-check above can't see a registration that lands
                # between the read and the write)
                try:
                    os.link(tmp, self._entry(name))
                except FileExistsError:
                    winner = self._read(name)
                    if winner == str(path):
                        return  # racing identical bindings both succeed
                    raise ValueError(
                        f"{name} was concurrently bound to {winner}; "
                        "pass replace=True to rebind"
                    ) from None
        finally:
            if tmp is not None:
                tmp.unlink(missing_ok=True)
        self._log("register", name, str(path))

    def unregister(self, name: str) -> None:
        name = self._check(name)
        existed = self._read(name) is not None
        self._entry(name).unlink(missing_ok=True)
        if existed:
            self._log("unregister", name, None)

    def exists(self, name: str) -> bool:
        return self._read(name) is not None

    def try_resolve(self, name: str) -> str | None:
        """The bound path, or None for unregistered (or non-db.table)
        names — one registry read where exists()+resolve() would pay
        two."""
        return self._read(name)

    def resolve(self, name: str) -> str:
        path = self._read(name)
        if path is None:
            raise KeyError(f"no versioned table registered as {name}")
        return path

    def default_path(self, name: str) -> str:
        """Where a NEW table created by name lands: ``<root>/<db>/<tbl>``
        (the warehouse-directory convention)."""
        db, tbl = self._check(name).split(".")
        return str(self.root / db / tbl)

    def _names(self) -> list[str]:
        if not self._dir.is_dir():
            return []
        return sorted(
            {
                # lowercase covers legacy pre-r16 mixed-case filenames
                p.name[: -len(".json")].lower()
                for p in self._dir.glob("*.json")
                if not p.name.startswith(".")
            }
        )

    def list_tables(self, db: str) -> list[str]:
        pre = f"{db.lower()}."
        return [n[len(pre):] for n in self._names() if n.startswith(pre)]

    def list_databases(self) -> list[str]:
        return sorted({n.split(".")[0] for n in self._names()})

    def table(
        self, spark: SparkSession, name: str, version: int | None = None
    ) -> DataFrame:
        """Read a registered table by name (optionally time-travelled) —
        the name-addressed twin of ``read_version``."""
        from .sinks.versioned import read_version

        return read_version(spark, self.resolve(name), version)


class CatalogManager:
    def __init__(
        self,
        spark: SparkSession,
        catalog: str = "spark_catalog",
        versioned: VersionedCatalog | None = None,
    ):
        self.spark = spark
        self.catalog = catalog
        # optional second plane: name-addressed versioned tables.  A
        # name bound in the registry WINS over a saveAsTable table of
        # the same name (the binding is an explicit user act; the
        # warehouse table is reachable by its own qualified name).
        self.versioned = versioned

    def _q(self, db: str) -> str:
        return f"{self.catalog}.{db}" if self.catalog else db

    def drop_database(self, db: str) -> None:
        """D1 (reference main.py:122)."""
        self.spark.sql(f"DROP DATABASE IF EXISTS {self._q(db)} CASCADE")

    def create_database(self, db: str) -> None:
        """D2 (reference utils/spark_write_iceberg.py:50)."""
        self.spark.sql(f"CREATE DATABASE IF NOT EXISTS {self._q(db)}")

    def list_tables(self, db: str) -> list[str]:
        """D4 (reference utils/catalog_manager.py:16-18) — the union of
        both planes when a versioned registry is attached.  A database
        that lives ONLY on the versioned plane (no Spark-catalog schema
        of that name) lists its registry half instead of raising; any
        OTHER SHOW TABLES failure (metastore hiccup, permissions)
        propagates — swallowing it would silently drop the
        Spark-catalog half of the union."""
        try:
            rows = self.spark.sql(f"SHOW TABLES IN {self._q(db)}").collect()
        except Exception as e:
            from pyspark.errors import AnalysisException

            missing_schema = isinstance(e, AnalysisException) and (
                (getattr(e, "getErrorClass", lambda: None)() or "")
                == "SCHEMA_NOT_FOUND"
                or "SCHEMA_NOT_FOUND" in str(e)
            )
            if (
                not missing_schema
                or self.versioned is None
                or not self.versioned.list_tables(db)
            ):
                raise
            rows = []
        # SHOW TABLES also lists session temp views — exclude them, they
        # are not tables of this database
        names = [r.tableName for r in rows if not r.isTemporary]
        if self.versioned is not None:
            names = sorted(set(names) | set(self.versioned.list_tables(db)))
        return names

    def list_databases(self) -> list[str]:
        """D5 (reference utils/catalog_manager.py:27) — unioned with
        the versioned registry's databases when one is attached, like
        every other enumeration on this manager."""
        rows = self.spark.sql(
            f"SHOW DATABASES IN {self.catalog}" if self.catalog else "SHOW DATABASES"
        ).collect()
        names = [r[0] for r in rows]
        if self.versioned is not None:
            names = sorted(set(names) | set(self.versioned.list_databases()))
        return names

    def table_exists(self, qualified_name: str) -> bool:
        """D6 — via the catalog API, not try/except (reference
        utils/catalog_manager.py:40-46 used the probe form); checks
        both planes when a versioned registry is attached."""
        if self.versioned is not None and self.versioned.exists(
            qualified_name
        ):
            return True
        return self.spark.catalog.tableExists(qualified_name)

    def table(self, qualified_name: str) -> DataFrame:
        """S6 (reference merge_to_minio.py:174).  A versioned binding
        resolves first (see ``__init__``)."""
        if self.versioned is not None and self.versioned.exists(
            qualified_name
        ):
            return self.versioned.table(self.spark, qualified_name)
        return self.spark.table(qualified_name)

    def register_catalog(self, name: str, conf: dict[str, str]) -> None:
        """D8 (reference config/catalog_config.py:10-63): runtime catalog
        registration via spark.sql.catalog.{name}.* settings."""
        for k, v in conf.items():
            self.spark.conf.set(f"spark.sql.catalog.{name}.{k}", v)

    def clear_cache(self) -> None:
        """D9 (reference utils/merge_utils.py:56)."""
        self.spark.catalog.clearCache()

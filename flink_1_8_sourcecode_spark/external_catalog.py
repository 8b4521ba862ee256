"""External catalog facade — TableEnvironment.registerExternalCatalog
parity (flink-table/.../api/TableEnvironment.scala:413; the in-memory
implementation mirrors catalog/InMemoryExternalCatalog.scala, a CRUD
tree of sub-catalogs and tables).

Spark-first mapping: the reference wires an ExternalCatalogSchema into
Calcite so ``catalog.db.table`` parses as a schema path.  Spark's
session catalog has no pluggable Python catalog hook, so the same
resolution happens one layer up, where this engine already does its
Flink-SQL routing (plans/rewrite_flink_sql, LATERAL/MATCH_RECOGNIZE
temp-view creation): qualified names rooted at a registered catalog are
resolved through the catalog tree and substituted with session temp
views before ``spark.sql`` sees the query.  The resolved object is a
plain DataFrame, so every Catalyst optimization (pushdown, pruning,
broadcast) applies unchanged — the catalog is a NAMESPACE, not an
execution path.

Tables may be registered as a DataFrame (eager) or a zero-arg callable
returning one (lazy — the descriptor/connector path registers these so
a source is only opened when first scanned).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame


class CatalogNotExistException(Exception):
    """api/exceptions.scala CatalogNotExistException."""

    def __init__(self, name: str):
        super().__init__(f"Catalog {name} does not exist.")
        self.name = name


class CatalogAlreadyExistException(Exception):
    """api/exceptions.scala CatalogAlreadyExistException."""

    def __init__(self, name: str):
        super().__init__(f"Catalog {name} already exists.")
        self.name = name


class TableNotExistException(Exception):
    """api/exceptions.scala TableNotExistException."""

    def __init__(self, catalog: str, table: str):
        super().__init__(f"Table {catalog}.{table} does not exist.")
        self.catalog = catalog
        self.table = table


class TableAlreadyExistException(Exception):
    """api/exceptions.scala TableAlreadyExistException."""

    def __init__(self, catalog: str, table: str):
        super().__init__(f"Table {catalog}.{table} already exists.")
        self.catalog = catalog
        self.table = table


class ExternalCatalogNotExistException(Exception):
    """api/exceptions.scala ExternalCatalogNotExistException — thrown by
    TableEnvironment.getRegisteredExternalCatalog (:431)."""

    def __init__(self, name: str):
        super().__init__(f"External catalog {name} does not exist.")
        self.name = name


TableLike = "DataFrame | Callable[[], DataFrame]"


class InMemoryExternalCatalog:
    """CRUD catalog tree (catalog/InMemoryExternalCatalog.scala): a
    catalog holds tables and sub-catalogs (databases); resolution walks
    ``catalog.db.table`` paths segment by segment."""

    def __init__(self, name: str):
        self.name = name
        self._tables: dict[str, TableLike] = {}
        self._subs: dict[str, "InMemoryExternalCatalog"] = {}

    # --- tables (InMemoryExternalCatalog.scala createTable/dropTable/
    # alterTable/getTable/listTables) ----------------------------------
    def create_table(
        self,
        table_name: str,
        table: "DataFrame | Callable[[], DataFrame]",
        ignore_if_exists: bool = False,
    ) -> None:
        if table_name in self._tables and not ignore_if_exists:
            raise TableAlreadyExistException(self.name, table_name)
        self._tables[table_name] = table

    def drop_table(self, table_name: str, ignore_if_not_exists: bool = False) -> None:
        if self._tables.pop(table_name, None) is None and not ignore_if_not_exists:
            raise TableNotExistException(self.name, table_name)

    def alter_table(
        self,
        table_name: str,
        table: "DataFrame | Callable[[], DataFrame]",
        ignore_if_not_exists: bool = False,
    ) -> None:
        if table_name in self._tables:
            self._tables[table_name] = table
        elif not ignore_if_not_exists:
            raise TableNotExistException(self.name, table_name)

    def get_table(self, table_name: str) -> DataFrame:
        t = self._tables.get(table_name)
        if t is None:
            raise TableNotExistException(self.name, table_name)
        return t() if callable(t) else t

    def list_tables(self) -> list[str]:
        return sorted(self._tables)

    # --- sub-catalogs (createSubCatalog/dropSubCatalog/getSubCatalog) --
    def create_sub_catalog(
        self,
        catalog_name: str,
        catalog: "InMemoryExternalCatalog | None" = None,
        ignore_if_exists: bool = False,
    ) -> "InMemoryExternalCatalog":
        if catalog_name in self._subs and not ignore_if_exists:
            raise CatalogAlreadyExistException(catalog_name)
        sub = self._subs.get(catalog_name)
        if sub is None or not ignore_if_exists:
            sub = catalog or InMemoryExternalCatalog(catalog_name)
            self._subs[catalog_name] = sub
        return sub

    def drop_sub_catalog(
        self, catalog_name: str, ignore_if_not_exists: bool = False
    ) -> None:
        if self._subs.pop(catalog_name, None) is None and not ignore_if_not_exists:
            raise CatalogNotExistException(catalog_name)

    def get_sub_catalog(self, catalog_name: str) -> "InMemoryExternalCatalog":
        sub = self._subs.get(catalog_name)
        if sub is None:
            raise CatalogNotExistException(catalog_name)
        return sub

    def list_sub_catalogs(self) -> list[str]:
        return sorted(self._subs)

    # --- path resolution ----------------------------------------------
    def resolve(self, path: "list[str]") -> DataFrame:
        """Walk ``db.db2....table`` below this catalog: every segment
        but the last must be a sub-catalog, the last must be a table
        (ExternalCatalogSchema's scan resolution)."""
        if not path:
            raise TableNotExistException(self.name, "<empty path>")
        cat = self
        for seg in path[:-1]:
            cat = cat.get_sub_catalog(seg)
        return cat.get_table(path[-1])

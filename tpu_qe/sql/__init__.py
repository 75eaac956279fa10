"""SQL front-end: parse (parser.py) + plan/execute (executor.py) over
the device operator families. Entry point: `Database`.

    from tpu_qe.sql import Database
    db = Database()
    db.register("t", {"k": ..., "v": ...})
    rows = db.sql("SELECT k, SUM(v) AS s FROM t GROUP BY k ORDER BY k")
"""

from tpu_qe.sql.executor import Database, SqlError
from tpu_qe.sql.parser import parse

__all__ = ["Database", "SqlError", "parse"]

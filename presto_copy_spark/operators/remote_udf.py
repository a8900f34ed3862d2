"""Remote function execution — the RemoteProjectOperator analogue.

Reference: presto-main/.../operator/project/RemoteProjectOperator.java +
presto-grpc-api: Presto ships row pages to an external function server
and splices the returned column back into the page stream.  The
Spark-first equivalent is an Arrow-batched ``mapInPandas`` stage that
POSTs each record batch (JSON-encoded here — the container has no
pyarrow-flight/grpc server to talk to) to a function endpoint and
yields the response columns.

Scale shape: batches leave the EXECUTORS, never the driver; parallelism
is ordinary partition parallelism, and the endpoint is whatever the
deployment's function service is.  Tests demo against a stdlib
http.server on loopback (the only network this container allows);
a real deployment points ``endpoint`` at its function sidecar.
"""

from __future__ import annotations

import json
from collections.abc import Iterator

from pyspark.sql import DataFrame


class RemoteFunctionError(RuntimeError):
    """Endpoint unreachable / returned an error — surfaced with the
    endpoint and HTTP detail instead of a raw worker stack trace."""


def remote_project(
    df: DataFrame,
    endpoint: str,
    function: str,
    in_cols: list[str],
    out_schema: str,
    batch_rows: int = 1024,
) -> DataFrame:
    """Apply a remote function to ``in_cols``, returning ``out_schema``
    rows (the remote service sees {"function", "columns", "rows"} and
    answers {"rows": [...]}, one output row per input row)."""

    def call(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:  # noqa: F821
        import urllib.error
        import urllib.request

        import pandas as pd

        for pdf in batches:
            for lo in range(0, len(pdf), batch_rows):
                chunk = pdf.iloc[lo : lo + batch_rows]
                payload = json.dumps(
                    {
                        "function": function,
                        "columns": in_cols,
                        "rows": chunk[in_cols].values.tolist(),
                    }
                ).encode()
                req = urllib.request.Request(
                    endpoint,
                    data=payload,
                    headers={"Content-Type": "application/json"},
                )
                try:
                    with urllib.request.urlopen(req, timeout=30) as resp:
                        out = json.loads(resp.read())
                except (urllib.error.URLError, OSError) as e:
                    raise RemoteFunctionError(
                        f"remote function {function!r} at {endpoint} failed: {e}"
                    ) from e
                rows = out["rows"]
                if len(rows) != len(chunk):
                    raise RemoteFunctionError(
                        f"remote function {function!r} returned {len(rows)}"
                        f" rows for {len(chunk)} inputs"
                    )
                yield pd.DataFrame(rows, columns=_schema_cols(out_schema))

    return df.mapInPandas(call, schema=out_schema)


def _schema_cols(schema: str) -> list[str]:
    return [part.strip().split()[0] for part in schema.split(",")]

"""docs/QUICKSTART.md must stay executable (r10, VERDICT r9 next #8):
every ```python block in the doc is exec'd in one shared namespace, in
document order, exactly as written — except blocks self-marked
"illustrative" (external services) and with /tmp/ sink paths rewritten
into the test's tmp dir.  A doc snippet that drifts from the API fails
the suite."""

from __future__ import annotations

import os
import re

SKIP_MARKER = "illustrative"
DOC = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "docs", "QUICKSTART.md")


def _blocks():
    text = open(DOC).read()
    return re.findall(r"```python\n(.*?)```", text, flags=re.S)


def test_doc_has_blocks():
    bs = _blocks()
    assert len(bs) >= 8, f"quickstart shrank to {len(bs)} python blocks"
    assert any(SKIP_MARKER in b for b in bs)


def test_quickstart_snippets_run(spark, tmp_path, capsys):
    import types

    import pandas as pd

    import pydiverse_transform_spark as pdt

    ns = {
        # the setup block (imports + session build) is compile-checked
        # below; its two bindings are provided here so the test reuses
        # the session fixture instead of booting a second JVM context
        "pdt": pdt,
        "spark": spark,
        # stand-in for the polars frame (polars is optional in this
        # container; from_polars only needs .to_pandas())
        "polars_df": types.SimpleNamespace(
            to_pandas=lambda: pd.DataFrame(dict(x=[1], y=[2]))),
    }
    ran = 0
    for block in _blocks():
        if SKIP_MARKER in block:
            continue
        if "SparkSession.builder" in block:
            # setup block: validated for importability only
            compile(block, "<quickstart-setup>", "exec")
            continue
        code = block.replace('"/tmp/', f'"{tmp_path}/')
        exec(compile(code, "<quickstart>", "exec"), ns)  # noqa: S102
        ran += 1
    assert ran >= 6
    # spot-check the front-page result computed by the doc
    result = ns["result"]
    assert len(result) == 6 and "sum_qty" in result.columns
    # dedup/ANN recipe outputs are live frames
    assert ns["clean"].count() > 0
    assert ns["deduped"].count() > 0
    assert ns["top"].count() == 10
    assert ns["approx"].count() == 10
    assert ns["hits"].columns == ["probe_id", "index_id", "est_jaccard"]
    assert ns["survivors"].count() >= 0

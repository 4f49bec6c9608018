"""Execute the three demo notebooks end to end (C16 parity claim).

Opt-in via RUN_NB_TESTS=1: each notebook trains/aggregates/renders on the
synthetic fixtures (CPU-pinned first cell), several minutes total — too
slow for the default suite, but the claim stays mechanically checkable:

    RUN_NB_TESTS=1 python -m pytest tests/test_notebooks.py -q
"""

import os

import pytest

pytestmark = pytest.mark.skipif(
    not os.environ.get("RUN_NB_TESTS"),
    reason="notebook execution is opt-in (RUN_NB_TESTS=1); several minutes",
)

NOTEBOOKS = [
    "notebooks/demo_train.ipynb",
    "notebooks/demo_final_performance_and_ablations.ipynb",
    "notebooks/demo_visualization.ipynb",
]


@pytest.mark.parametrize("path", NOTEBOOKS)
def test_notebook_executes(path):
    import nbformat
    from nbclient import NotebookClient

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    nb = nbformat.read(os.path.join(root, path), as_version=4)
    client = NotebookClient(
        nb, timeout=600, kernel_name="python3",
        # kernel cwd must be notebooks/ — the cells use '..'-relative paths
        resources={"metadata": {"path": os.path.join(root, "notebooks")}},
    )
    client.execute()  # raises CellExecutionError on any failing cell

"""Framework-wide constants.

Reference parity: mmlearn/constants.py (EXAMPLE_INDEX_KEY at
/root/reference/mmlearn/constants.py:3).
"""

EXAMPLE_INDEX_KEY = "example_index"

TEMPLATES = {
    "{}": lambda x: f"{x}",
}

# Key under which per-example validity masks are stored in collated batches.
# TPU-specific: XLA requires static shapes, so heterogeneous batches carry a
# boolean validity mask per modality instead of ragged tensors (see SURVEY.md §7
# "Hard parts" #1).
MODALITY_PRESENCE_SUFFIX = "_presence"

# Key under which the originating sub-dataset index of each example is stored.
DATASET_INDEX_KEY = "dataset_index"

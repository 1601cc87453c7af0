from .binary import (  # noqa: F401
    binary_accuracy,
    dice_coefficient,
    jaccard_index,
    precision_recall,
)

from .alias import AliasSampler
from .criterion import (
    DistillKL, nce_loss, nce_softmax_loss, attention_loss, hint_loss,
)
from .nce import NCEAverageState, init_nce_average, nce_forward
from .embed import Embed, LinearEmbed, MLPEmbed, l2_normalize

from .fusion_trainer import evaluate_fusion_model, train_fusion_head  # noqa: F401
from .losses import info_nce, joint_contrastive_loss  # noqa: F401
from .schedule import cosine_annealing_lr  # noqa: F401
from .trainer import CLIPTrainer, EarlyStopper, make_encode_step, make_optimizer, make_train_step  # noqa: F401

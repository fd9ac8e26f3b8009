from .posevq import PoseVQ, PoseVQConfig, VQState, vq_init_state
from .smpl import SMPLModel, load_smpl_model, smpl_openpose_forward, synthetic_smpl_model
from .token_head import RegressionHead, TokenHead, TokenHeadConfig
from .tokenhmr import TokenHMRConfig, forward_step, init_tokenhmr
from .transformer import DecoderConfig, TransformerDecoder
from .vit import ViT, ViTConfig

"""Round-5 verify drive: new weight paths + HPS towers on the real device."""
import numpy as np, torch, tempfile, os
import jax, jax.numpy as jnp
print("devices:", jax.devices())

# u2net: official-layout ckpt -> load_u2net -> saliency mask on device
from freefine_tpu.models.u2net import U2Net, u2netp_config, get_mask_from_saliency
from freefine_tpu.weights import load_u2net
fix = "/root/repo/tests/fixtures/u2netp_keys.txt"
rng = np.random.RandomState(0)
sd = {}
for ln in open(fix).read().splitlines():
    key, shp = ln.split()
    shape = tuple(int(s) for s in shp.split(","))
    arr = rng.normal(scale=0.1, size=shape).astype(np.float32)
    if key.endswith("running_var"):
        arr = np.abs(arr) + 0.5
    sd[key] = torch.from_numpy(arr)
path = os.path.join(tempfile.mkdtemp(), "u2netp.pth")
torch.save(sd, path)
model = U2Net(u2netp_config())
params = model.init(jax.random.key(0), jnp.zeros((1, 64, 64, 3)))
params = load_u2net(params, path)
img = (np.random.RandomState(1).rand(96, 96, 3) * 255).astype(np.uint8)
mask = get_mask_from_saliency(model, params, img, size=64)
print("u2net mask:", mask.shape, mask.dtype, np.unique(mask))

# HPS towers (tiny ViT-H-shaped config not needed; drive the small default
# with random weights through the activation switch on device)
from freefine_tpu.models.clip_image import CLIPImageEncoder, CLIPVisionConfig
cfg = CLIPVisionConfig(image_size=32, patch_size=16, hidden_size=64,
                       intermediate_size=128, num_layers=2, num_heads=2,
                       projection_dim=16, activation="gelu")
m = CLIPImageEncoder(cfg)
x = jnp.asarray(np.random.RandomState(2).randn(2, 32, 32, 3), jnp.float32)
p = m.init(jax.random.key(0), x)
feats = jax.jit(m.apply)(p, x)
print("gelu vision tower:", np.asarray(feats).shape, bool(np.isfinite(np.asarray(feats)).all()))
print("R5 DRIVE OK")

"""TPU-native compute ops: attention dispatch, masks, warps, splatting."""

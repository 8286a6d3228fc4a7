"""Flax model zoo: SD-1.5 UNet/VAE/CLIP plus perception models."""

"""Bust fitting: JAX SMPL-X linear blend skinning, landmark/silhouette losses,
fitted-transform export and bust/scalp mesh processing."""

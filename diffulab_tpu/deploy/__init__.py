from diffulab_tpu.deploy.export import DeployedSampler, export_generate

__all__ = ["DeployedSampler", "export_generate"]

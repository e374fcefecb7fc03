from .enhancement import EnhancementAEC
from .minutiae_net import MinutiaeAEC, MinutiaeUNet
from .descriptor_net import DescriptorNet
from .compnet import CompNet

__all__ = ["EnhancementAEC", "MinutiaeAEC", "MinutiaeUNet", "DescriptorNet",
           "CompNet"]

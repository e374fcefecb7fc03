from .enhancement import EnhancementAEC
from .minutiae_net import MinutiaeAEC, MinutiaeAEC64, MinutiaeUNet
from .descriptor_net import DescriptorNet
from .compnet import CompNet

__all__ = ["EnhancementAEC", "MinutiaeAEC", "MinutiaeAEC64", "MinutiaeUNet",
           "DescriptorNet", "CompNet"]

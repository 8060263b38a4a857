"""Model zoo for the BASELINE configs (SURVEY.md §6):
MobileNetV1, ResNet-50, MobileNetV3(+SSD), PP-OCR (DBNet/CRNN), ERNIE-tiny.
"""

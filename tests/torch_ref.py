"""Torch mirror of the reference CRNN architecture, used ONLY as a test
oracle for numerics parity.

Written from the architecture spec in SURVEY.md §2.1 (reference:
src/models/CNN.py, CNN_FPN.py, RNN.py, CRNN.py, CRNN_GRL.py). Module/state
names match the reference checkpoint format exactly (cnn.cnn.conv{i},
rnn.rnn.weight_ih_l{k}, ...) because that format is the load contract for
``bsed_tpu.utils.torch_compat``.
"""
import numpy as np
import torch
from torch import nn


class TorchGLU(nn.Module):
    def __init__(self, n):
        super().__init__()
        self.linear = nn.Linear(n, n)

    def forward(self, x):  # x: (B, C, H, W)
        lin = self.linear(x.permute(0, 2, 3, 1)).permute(0, 3, 1, 2)
        return lin * torch.sigmoid(x)


def build_cnn_stack(n_in, nb_filters, pooling, dropout=0.5):
    seq = nn.Sequential()
    for i, nf in enumerate(nb_filters):
        n_prev = n_in if i == 0 else nb_filters[i - 1]
        seq.add_module(f"conv{i}", nn.Conv2d(n_prev, nf, 3, 1, 1))
        seq.add_module(f"batchnorm{i}",
                       nn.BatchNorm2d(nf, eps=1e-3, momentum=0.99))
        seq.add_module(f"glu{i}", TorchGLU(nf))
        seq.add_module(f"dropout{i}", nn.Dropout(dropout))
        seq.add_module(f"pooling{i}", nn.AvgPool2d(tuple(pooling[i])))
    return seq


class TorchCNNWrap(nn.Module):
    def __init__(self, *a, **k):
        super().__init__()
        self.cnn = build_cnn_stack(*a, **k)

    def forward(self, x):
        return self.cnn(x)


class TorchBiGRUWrap(nn.Module):
    def __init__(self, n_in, n_hidden, num_layers):
        super().__init__()
        self.rnn = nn.GRU(n_in, n_hidden, bidirectional=True,
                          batch_first=True, num_layers=num_layers)

    def forward(self, x):
        out, _ = self.rnn(x)
        return out


class TorchCRNN(nn.Module):
    def __init__(self, nb_filters=(16, 32, 64, 128, 128, 128, 128),
                 pooling=((2, 2), (2, 2), (1, 2), (1, 2), (1, 2), (1, 2), (1, 2)),
                 n_rnn=128, n_layers=2, dropout=0.5):
        super().__init__()
        self.cnn = TorchCNNWrap(1, nb_filters, pooling, dropout)
        self.rnn = TorchBiGRUWrap(nb_filters[-1], n_rnn, n_layers)
        self.dropout = nn.Dropout(dropout)

    def forward(self, x):  # x: (B, 1, T, F)
        x = self.cnn(x)
        x = x.squeeze(-1).permute(0, 2, 1)  # (B, T', C)
        x = self.rnn(x)
        x = self.dropout(x)
        return x, x


class TorchCNNFPNWrap(nn.Module):
    def __init__(self, nb_filters, pooling, dropout=0.5):
        super().__init__()
        self.cnn = build_cnn_stack(1, nb_filters, pooling, dropout)
        self.cnn_fcn = nn.Conv2d(nb_filters[-1], nb_filters[-1], 3, 1, 1)
        self.glu = TorchGLU(nb_filters[-1])
        self.pool_fcn = nn.AvgPool2d((2, 1))
        self.bn_fcn = nn.BatchNorm2d(nb_filters[-1], eps=1e-3, momentum=0.99)
        self.dropout = nn.Dropout(0.5)

    def forward(self, x):
        x = self.cnn(x)
        h = self.pool_fcn(self.dropout(self.glu(self.bn_fcn(self.cnn_fcn(x)))))
        x_2 = h
        h = self.pool_fcn(self.dropout(self.glu(self.bn_fcn(self.cnn_fcn(h)))))
        return x, x_2, h


class TorchCRNNFPN(nn.Module):
    def __init__(self, t_frames, nb_filters=(16, 32, 64, 128, 128, 128, 128),
                 pooling=((2, 2), (2, 2), (1, 2), (1, 2), (1, 2), (1, 2), (1, 2)),
                 n_rnn=128, n_layers=2, dropout=0.5):
        super().__init__()
        self.cnn = TorchCNNFPNWrap(nb_filters, pooling, dropout)
        self.rnn = TorchBiGRUWrap(nb_filters[-1], n_rnn, n_layers)
        self.rnn_2 = TorchBiGRUWrap(nb_filters[-1], n_rnn, n_layers)
        self.rnn_4 = TorchBiGRUWrap(nb_filters[-1], n_rnn, n_layers)
        self.dropout = nn.Dropout(dropout)
        t2 = t_frames // 2
        self.upsample_2 = nn.Upsample((t_frames, 1), mode="bilinear",
                                      align_corners=True)
        self.upsample_4 = nn.Upsample((t2, 1), mode="bilinear",
                                      align_corners=True)
        self.conv1x1_2 = nn.Conv2d(4 * n_rnn, 2 * n_rnn, 1)
        self.conv1x1_4 = nn.Conv2d(4 * n_rnn, 2 * n_rnn, 1)

    def forward(self, x):
        x, x_2, x_4 = self.cnn(x)
        x = self.rnn(x.squeeze(-1).permute(0, 2, 1)).permute(0, 2, 1)
        x_2 = self.rnn_2(x_2.squeeze(-1).permute(0, 2, 1)).permute(0, 2, 1)
        x_4 = self.rnn_4(x_4.squeeze(-1).permute(0, 2, 1)).permute(0, 2, 1)
        x = self.dropout(x.permute(0, 2, 1)).permute(0, 2, 1).unsqueeze(-1)
        x_2 = self.dropout(x_2.permute(0, 2, 1)).permute(0, 2, 1).unsqueeze(-1)
        x_4 = self.dropout(x_4.permute(0, 2, 1)).permute(0, 2, 1).unsqueeze(-1)
        x_2 = self.conv1x1_2(torch.cat((x_2, self.upsample_4(x_4)), 1))
        x = self.conv1x1_4(torch.cat((x, self.upsample_2(x_2)), 1)).squeeze(-1)
        x = x.permute(0, 2, 1)
        return x, x


class TorchPredictor(nn.Module):
    def __init__(self, nclass=20, n_rnn=128):
        super().__init__()
        self.dense = nn.Linear(2 * n_rnn, nclass)
        self.dense_softmax = nn.Linear(2 * n_rnn, nclass)

    def forward(self, x, inference=False):
        strong = torch.sigmoid(self.dense(x))
        sof = torch.softmax(self.dense_softmax(x), dim=-1)
        sof = torch.clamp(sof, min=1e-7, max=1)
        weak = (strong * sof).sum(1) / sof.sum(1)
        if inference:
            gate = (weak > 0.5).float().unsqueeze(1)
            strong = strong * gate
        return strong, weak


def state_dict_numpy(model) -> dict:
    return {k: v.detach().numpy() for k, v in model.state_dict().items()}


class TorchBasicBlock(nn.Module):
    """torchvision-compatible resnet BasicBlock (key names conv1/bn1/conv2/
    bn2/downsample.{0,1}) — oracle for convert_resnet18_tagger."""

    def __init__(self, n_in, n_out, stride=1):
        super().__init__()
        self.conv1 = nn.Conv2d(n_in, n_out, 3, stride, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(n_out)
        self.conv2 = nn.Conv2d(n_out, n_out, 3, 1, 1, bias=False)
        self.bn2 = nn.BatchNorm2d(n_out)
        self.downsample = None
        if stride != 1 or n_in != n_out:
            self.downsample = nn.Sequential(
                nn.Conv2d(n_in, n_out, 1, stride, bias=False),
                nn.BatchNorm2d(n_out))

    def forward(self, x):
        r = x if self.downsample is None else self.downsample(x)
        y = torch.relu(self.bn1(self.conv1(x)))
        y = self.bn2(self.conv2(y))
        return torch.relu(y + r)


class TorchResNet18(nn.Module):
    """torchvision-resnet18-shaped network with the reference's surgery
    applied (1-channel conv1, nclass fc — audio_tagging_system_cnn.py:55-58)
    and a sigmoid head, mirroring ResNet18Tagger."""

    def __init__(self, nclass=20, in_ch=1):
        super().__init__()
        self.conv1 = nn.Conv2d(in_ch, 64, 7, 2, 3, bias=False)
        self.bn1 = nn.BatchNorm2d(64)
        self.maxpool = nn.MaxPool2d(3, 2, 1)
        feats = [64, 128, 256, 512]
        for s, f in enumerate(feats):
            n_in = 64 if s == 0 else feats[s - 1]
            layer = nn.Sequential(
                TorchBasicBlock(n_in, f, stride=1 if s == 0 else 2),
                TorchBasicBlock(f, f))
            setattr(self, f"layer{s + 1}", layer)
        self.fc = nn.Linear(512, nclass)

    def forward(self, x):  # x: (B, 1, H, W)
        x = self.maxpool(torch.relu(self.bn1(self.conv1(x))))
        for s in range(4):
            x = getattr(self, f"layer{s + 1}")(x)
        x = x.mean(dim=(2, 3))
        return torch.sigmoid(self.fc(x))

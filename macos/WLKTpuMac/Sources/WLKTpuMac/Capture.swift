// Microphone capture: AVAudioEngine tap → 16 kHz mono s16le frames.
// The converter handles whatever the input device's native format is.

import AVFoundation

final class MicCapture {
    var onPCM: ((Data) -> Void)?

    private let engine = AVAudioEngine()
    private var converter: AVAudioConverter?
    private let targetFormat = AVAudioFormat(
        commonFormat: .pcmFormatInt16, sampleRate: 16000, channels: 1, interleaved: true
    )!

    func start() throws {
        let input = engine.inputNode
        let native = input.outputFormat(forBus: 0)
        converter = AVAudioConverter(from: native, to: targetFormat)

        input.installTap(onBus: 0, bufferSize: 4096, format: native) { [weak self] buffer, _ in
            guard let self, let converter = self.converter else { return }
            let ratio = self.targetFormat.sampleRate / native.sampleRate
            let capacity = AVAudioFrameCount(Double(buffer.frameLength) * ratio) + 16
            guard let out = AVAudioPCMBuffer(
                pcmFormat: self.targetFormat, frameCapacity: capacity
            ) else { return }
            var fed = false
            converter.convert(to: out, error: nil) { _, status in
                if fed {
                    status.pointee = .noDataNow
                    return nil
                }
                fed = true
                status.pointee = .haveData
                return buffer
            }
            guard out.frameLength > 0, let ch = out.int16ChannelData else { return }
            let data = Data(
                bytes: ch[0], count: Int(out.frameLength) * MemoryLayout<Int16>.size
            )
            self.onPCM?(data)
        }
        engine.prepare()
        try engine.start()
    }

    func stop() {
        engine.inputNode.removeTap(onBus: 0)
        engine.stop()
    }
}
